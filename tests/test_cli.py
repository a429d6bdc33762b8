"""Config-driven train/predict lifecycle (reference ``train.py`` /
``predict.py`` counterpart): train writes a reloadable model directory,
predict in the same contract writes JSON-lines {user_id, business_id,
stars, decision}, and the round-trip equals calling the model functions
directly."""

from __future__ import annotations

import json

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

from yelp_recommender_spark import fixtures as FX


@pytest.fixture(scope="module")
def data_files(spark, tmp_path_factory):  # noqa: F811
    root = tmp_path_factory.mktemp("cli_data")
    reviews = root / "reviews.json"
    with open(reviews, "w") as fh:
        for u, b, s, text in FX.TRAIN_REVIEWS:
            fh.write(
                json.dumps(
                    {"user_id": u, "business_id": b, "stars": s, "text": text}
                )
                + "\n"
            )
    test = root / "test_pairs.json"
    with open(test, "w") as fh:
        for u, b in FX.TEST_PAIRS:
            fh.write(json.dumps({"user_id": u, "business_id": b}) + "\n")
    return str(reviews), str(test), str(root)


def _run_lifecycle(spark, data_files, model, params=None):  # noqa: F811
    from yelp_recommender_spark import cli

    reviews, test, root = data_files
    cfg = {
        "model": model,
        "training_data": reviews,
        "model_dir": f"{root}/{model}_model",
        "params": params or {},
    }
    cfg_path = f"{root}/{model}_cfg.json"
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    loaded_cfg = cli.load_config(cfg_path)
    cli.train(spark, loaded_cfg)
    out = f"{root}/{model}_preds"
    preds = cli.predict(spark, loaded_cfg, test, out)
    rows = {(r.user_id, r.business_id): r for r in preds.collect()}
    # the sink wrote the contract as JSON lines
    written = spark.read.json(out)
    assert set(written.columns) >= {"user_id", "business_id", "stars"}
    assert written.count() == len(rows)
    return rows


def test_cli_baseline_lifecycle(spark, data_files):  # noqa: F811
    rows = _run_lifecycle(spark, data_files, "baseline")
    # same ladder as calling predict_baseline directly
    assert rows[("u_new", "b_new")].decision == "default"
    assert rows[("u_new", "b_new")].stars == 2.5
    assert rows[("u1", "b2")].decision == "both_avg"


def test_cli_item_cf_lifecycle(spark, data_files):  # noqa: F811
    rows = _run_lifecycle(
        spark, data_files, "item_cf", {"min_corated": 2, "k_neighbors": 10}
    )
    assert rows[("u_new", "b_new")].decision == "default"
    assert all(r.stars is not None for r in rows.values())


def test_cli_als_lifecycle(spark, data_files):  # noqa: F811
    rows = _run_lifecycle(
        spark, data_files, "als", {"rank": 4, "max_iter": 5}
    )
    # string ids trained through the indexers; unseen ids hit the ladder
    assert rows[("u1", "b2")].decision == "als"
    assert rows[("u_new", "b_new")].decision == "default"


def test_cli_hybrid_lifecycle(spark, data_files):  # noqa: F811
    rows = _run_lifecycle(
        spark, data_files, "hybrid", {"rank": 4, "max_iter": 1}
    )
    assert all(r.decision == "hybrid" for r in rows.values())
    assert all(1.0 <= r.stars <= 5.0 or r.stars is not None for r in rows.values())


def test_cli_config_validation(tmp_path):
    from yelp_recommender_spark import cli

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"model": "nope"}))
    with pytest.raises(ValueError):
        cli.load_config(str(bad))
