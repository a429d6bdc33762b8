"""Config-driven train/predict lifecycle (reference ``train.py`` /
``predict.py`` counterpart): train writes a reloadable model directory,
predict in the same contract writes JSON-lines {user_id, business_id,
stars, decision}, and the round-trip equals calling the model functions
directly."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)

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
    # train consulted the sketch-backed planner on the co-rating
    # self-join and persisted the verdict with the model
    _, _, root = data_files
    plan = json.loads(
        spark.read.parquet(
            f"{root}/item_cf_model/tables/cf_join_plan"
        ).head()["plan_json"]
    )
    assert {"est_pairs", "explosion", "n_rows"} <= set(plan)


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


def test_cli_content_lifecycle(spark, data_files):  # noqa: F811
    rows = _run_lifecycle(
        spark, data_files, "content", {"top_k": 50, "min_df": 1}
    )
    assert rows[("u_new", "b_new")].decision == "default"
    # a seen pair with token overlap scores through the cosine rule
    assert rows[("u1", "b2")].decision in ("cos", "both_avg")
    assert all(r.stars is not None for r in rows.values())


def test_cli_user_cf_lifecycle(spark, data_files):  # noqa: F811
    rows = _run_lifecycle(
        spark, data_files, "user_cf", {"min_corated": 2, "k_neighbors": 10}
    )
    assert rows[("u_new", "b_new")].decision == "default"
    assert all(r.stars is not None for r in rows.values())


def test_cli_als_grid_lifecycle(spark, data_files, tmp_path):  # noqa: F811
    """params.grid runs the reference's ranks × regs sweep; the persisted
    model is the best-by-validation-RMSE pick and the sweep lands in the
    als_grid table with exactly one best row. Uses a dense synthetic
    ratings file (every user rates every business) so validation pairs
    are warm — the 13-review shared fixture leaves them all cold, which
    the grid correctly rejects with an error."""
    from yelp_recommender_spark import cli
    from yelp_recommender_spark.models.persistence import load_model

    _, test, _ = data_files
    root = str(tmp_path)
    reviews = f"{root}/dense_reviews.json"
    with open(reviews, "w") as fh:
        for u in range(20):
            for b in range(8):
                fh.write(
                    json.dumps(
                        {
                            "user_id": f"u{u}",
                            "business_id": f"b{b}",
                            "stars": float(1 + (u * 7 + b * 3) % 5),
                            "text": "t",
                        }
                    )
                    + "\n"
                )
    cfg = {
        "model": "als",
        "training_data": reviews,
        "model_dir": f"{root}/als_model",
        "params": {
            "max_iter": 3,
            "grid": {"ranks": [2, 4], "regs": [0.1, 0.3]},
        },
    }
    cfg_path = f"{root}/als_grid_cfg.json"
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    loaded = cli.load_config(cfg_path)
    cli.train(spark, loaded)
    preds = cli.predict(spark, loaded, test, f"{root}/als_grid_preds")
    rows = {(r.user_id, r.business_id): r for r in preds.collect()}
    assert rows[("u_new", "b_new")].decision == "default"
    m = load_model(spark, f"{root}/als_model")
    grid = m["als_grid"].collect()
    assert len(grid) == 4
    assert {(r.rank, r.reg) for r in grid} == {
        (2, 0.1), (2, 0.3), (4, 0.1), (4, 0.3)
    }
    best = [r for r in grid if r.best]
    assert len(best) == 1
    scored = [r for r in grid if r.val_rmse is not None]
    assert best[0].val_rmse == min(r.val_rmse for r in scored)


def test_cli_evaluate_roundtrip(spark, data_files, capsys):  # noqa: F811
    """train → predict → evaluate: the third lifecycle leg (reference
    scripts/evaluate.py) reports overall RMSE with missing/NaN pairs
    excluded-but-counted, plus the per-decision breakdown."""
    from yelp_recommender_spark import cli

    reviews, test, root = data_files
    _run_lifecycle(spark, data_files, "baseline")
    truth = f"{root}/truth.json"
    with open(truth, "w") as fh:
        for u, b, s in FX.TEST_TRUTH:
            fh.write(
                json.dumps({"user_id": u, "business_id": b, "stars": s}) + "\n"
            )
        # a truth pair with no prediction: counted, not silently dropped
        fh.write(
            json.dumps(
                {"user_id": "u_gone", "business_id": "b_gone", "stars": 3.0}
            )
            + "\n"
        )
    result = cli.evaluate(spark, f"{root}/baseline_preds", truth)
    out_line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out_line) == result
    assert result["n_scored"] == len(FX.TEST_TRUTH)
    assert result["n_missing"] == 1
    assert result["rmse"] is not None
    assert set(result["by_decision"]) <= {
        "both_avg", "usr_avg", "biz_avg", "default"
    }
    assert sum(d["n"] for d in result["by_decision"].values()) == len(
        FX.TEST_TRUTH
    )


def test_cli_evaluate_untagged_predictions(spark, tmp_path):  # noqa: F811
    """Predictions without a decision field (external producers) must
    evaluate cleanly, grouping under 'untagged' instead of a None key
    that would break the JSON report."""
    from yelp_recommender_spark import cli

    preds = tmp_path / "preds.json"
    truth = tmp_path / "truth.json"
    with open(preds, "w") as fh:
        fh.write(json.dumps({"user_id": "u", "business_id": "b", "stars": 4.0}) + "\n")
    with open(truth, "w") as fh:
        fh.write(json.dumps({"user_id": "u", "business_id": "b", "stars": 5.0}) + "\n")
    result = cli.evaluate(spark, str(preds), str(truth))
    assert result["rmse"] == 1.0
    assert result["by_decision"] == {"untagged": {"n": 1, "rmse": 1.0}}


def test_cli_maintain_compacts_and_reports(spark, tmp_path):  # noqa: F811
    import json

    from yelp_recommender_spark.cli import main

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    spark.range(0, 5000).selectExpr("id", "id * 2 as v").repartition(
        16
    ).write.parquet(src)

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(
            [
                "maintain",
                "--input", src,
                "--output", dst,
                "--target-mb", "1024",
                "--order-cols", "id",
                "--not-null", "id,v",
            ]
        )
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["files"] == 1
    assert all(c["passed"] for c in report["checks"])
    assert spark.read.parquet(dst).count() == 5000


def test_cli_maintain_fails_on_violation(spark, tmp_path):  # noqa: F811
    import contextlib, io

    import pytest

    from yelp_recommender_spark.cli import main

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "out2")
    spark.createDataFrame(
        [(1, "a"), (None, "b")], "id long, v string"
    ).write.parquet(src)
    with contextlib.redirect_stdout(io.StringIO()):
        with pytest.raises(SystemExit) as exc:
            main(
                [
                    "maintain",
                    "--input", src,
                    "--output", dst,
                    "--not-null", "id",
                ]
            )
    assert exc.value.code == 2


def test_cli_explain_audits_a_query(spark, tmp_path, capsys):  # noqa: F811
    """The explain subcommand dumps PLANS.md-style node counts — the
    plan-pin methodology as a user-facing tool (VERDICT r4 #8)."""
    import pytest

    from yelp_recommender_spark import cli

    md = str(tmp_path / "audit.md")
    cli.main(
        ["explain", "--query", "q01_pricing_summary", "--markdown", md,
         "--sf-dir", SF_DIR]
    )
    out = capsys.readouterr().out
    assert "q01_pricing_summary: exchanges: 1" in out
    assert "1 with pushed filters" in out
    content = open(md).read()
    assert "## q01_pricing_summary" in content

    with pytest.raises(SystemExit):
        cli.main(["explain", "--query", "nonexistent_query"])
    with pytest.raises(SystemExit):
        cli.main(["explain"])
