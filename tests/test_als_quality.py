"""Quality gates for the two iterative-MLlib rows-only catalog entries
(VERDICT r5 #7): q56/q57 carry no SQL oracle BY NATURE (iterative
least-squares / boosting), so these pins are their evidence —
(a) seeded determinism: the same session must produce identical
recommendations twice at a fixed seed (shape gates alone would admit a
nondeterministic model), and (b) a recall floor on a PLANTED preference
structure: the factorization must actually recover a signal we put
there, not merely emit rows of the right schema."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(
            round(v, 6) if isinstance(v, float) else v for v in r
        )
        for r in df.collect()
    )


@pytest.mark.parametrize(
    "name", ["q56_als_recommend", "q57_hybrid_recommend"]
)
def test_recommendations_deterministic_at_fixed_seed(spark, name):  # noqa: F811
    """Two full runs in one session → identical (user, biz, prediction,
    decision) sets. The split is deterministic by construction
    (models/ratings.py), ALS and GBT are seeded; this pins that no
    unseeded randomness (or partition-order dependence above rounding)
    leaks into the recommendations."""
    from yelp_recommender_spark.queries import QUERIES

    first = _rows(QUERIES[name](spark, SF))
    second = _rows(QUERIES[name](spark, SF))
    assert len(first) > 0
    assert first == second


def _planted(spark):  # noqa: F811
    """40 users × 20 items in two taste blocks: users < 20 love items
    < 10 and hate items ≥ 10; users ≥ 20 the reverse. Per user, 2 items
    of EACH block are held out, rotating with the user id so every item
    still appears in train (no cold items — the pin targets the
    factorization, the cold-start ladder has its own tests) — train
    carries the structure, test asks the model to extrapolate it."""
    train, test = [], []
    for u in range(40):
        likes_low = u < 20
        held = {u % 10, (u + 5) % 10}
        for i in range(20):
            stars = 5.0 if (i < 10) == likes_low else 1.0
            row = (u, i, stars)
            (test if i % 10 in held else train).append(row)
    schema = "user_id int, business_id int, stars double"
    return (
        spark.createDataFrame(train, schema),
        spark.createDataFrame(test, schema),
    )


def test_als_recovers_planted_preferences(spark):  # noqa: F811
    """recall@2: among each user's 4 held-out items (2 loved, 2 hated),
    the 2 highest ALS predictions must be the loved ones for ≥ 90% of
    users — the factorization recovers structure it was never shown
    directly (those cells are absent from train)."""
    from yelp_recommender_spark.models.als_hybrid import (
        predict_als,
        train_als,
    )
    from yelp_recommender_spark.models.baseline import fit_avgs

    train, test = _planted(spark)
    user_avg, biz_avg = fit_avgs(train)
    model = train_als(train, rank=4, reg=0.1, max_iter=10)
    preds = predict_als(
        model, test.select("user_id", "business_id"), user_avg, biz_avg
    ).collect()
    assert all(r.decision == "als" for r in preds)  # no cold fallbacks
    truth = {
        (r.user_id, r.business_id): r.stars for r in test.collect()
    }
    by_user: dict[int, list] = {}
    for r in preds:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user) == 40
    hits = total = 0
    for u, rows in by_user.items():
        assert len(rows) == 4
        top2 = sorted(rows, key=lambda r: -r.stars)[:2]
        hits += sum(
            1 for r in top2 if truth[(u, r.business_id)] == 5.0
        )
        total += 2
    assert hits / total >= 0.9, f"recall@2 = {hits / total:.3f}"


def test_hybrid_recovers_planted_preferences(spark):  # noqa: F811
    """The GBT blend (q57's model shape) must preserve the ALS feature's
    planted signal: same recall@2 fixture, floor 0.8 (the blend mixes in
    user/item averages, which are uninformative 3.0 here — a blend that
    drowned the ALS feature would score ~0.5, chance level)."""
    from yelp_recommender_spark.models.als_hybrid import (
        hybrid_features,
        predict_hybrid,
        train_als,
        train_hybrid_regressor,
    )
    from yelp_recommender_spark.models.baseline import fit_avgs
    from yelp_recommender_spark.models.cf import dedup_ratings

    train, test = _planted(spark)
    user_avg, biz_avg = fit_avgs(train)
    model = train_als(train, rank=4, reg=0.1, max_iter=10)
    feats_train = hybrid_features(
        model, train.select("user_id", "business_id"),
        user_avg, biz_avg, 3.0,
    ).join(
        dedup_ratings(train, "business_id", "user_id"),
        ["user_id", "business_id"],
    )
    reg = train_hybrid_regressor(feats_train)
    preds = predict_hybrid(
        reg,
        hybrid_features(
            model, test.select("user_id", "business_id"),
            user_avg, biz_avg, 3.0,
        ),
    ).collect()
    truth = {
        (r.user_id, r.business_id): r.stars for r in test.collect()
    }
    by_user: dict[int, list] = {}
    for r in preds:
        by_user.setdefault(r.user_id, []).append(r)
    hits = total = 0
    for u, rows in by_user.items():
        top2 = sorted(rows, key=lambda r: -r.stars)[:2]
        hits += sum(
            1 for r in top2 if truth[(u, r.business_id)] == 5.0
        )
        total += 2
    assert hits / total >= 0.8, f"recall@2 = {hits / total:.3f}"


def test_hybrid_rmse_beats_baseline_on_planted_signal(spark):  # noqa: F811
    """r9 quality bound (VERDICT r8 #7): on a fixture WITH preference
    structure, the hybrid blend's validation RMSE must beat the
    baseline averages predictor — the reference's entire point
    (`scripts/evaluate.py`), and the gate a silently-degenerate blend
    (collapsing to the average features) cannot pass: here every
    user/item average is exactly 3.0, so a degenerate blend scores
    RMSE ≈ 2.0 while a healthy one extrapolates the planted blocks.

    Deliberately NOT gated on the sf ratings fixture: the synthetic
    TPC-H-derived stars carry no user×item signal (measured at
    sf0.001: baseline 1.394, hybrid 1.657) — on noise no model should
    beat the mean, and an ordering gate there would pin overfitting
    avoidance of a test-scale artifact, not blend health."""
    from yelp_recommender_spark.models.als_hybrid import (
        hybrid_features,
        predict_hybrid,
        train_als,
        train_hybrid_regressor,
    )
    from yelp_recommender_spark.models.baseline import (
        fit_avgs,
        predict_baseline,
    )
    from yelp_recommender_spark.models.cf import dedup_ratings
    from yelp_recommender_spark.models.evaluator import rmse

    train, test = _planted(spark)
    user_avg, biz_avg = fit_avgs(train)

    base = predict_baseline(
        test.select("user_id", "business_id"), user_avg, biz_avg
    )
    rmse_base = float(rmse(base, test).collect()[0]["rmse"])
    assert abs(rmse_base - 2.0) < 1e-6  # all averages are 3.0 by design

    model = train_als(train, rank=4, reg=0.1, max_iter=10)
    feats_train = hybrid_features(
        model, train.select("user_id", "business_id"),
        user_avg, biz_avg, 3.0,
    ).join(
        dedup_ratings(train, "business_id", "user_id"),
        ["user_id", "business_id"],
    )
    reg = train_hybrid_regressor(feats_train)
    preds = predict_hybrid(
        reg,
        hybrid_features(
            model, test.select("user_id", "business_id"),
            user_avg, biz_avg, 3.0,
        ),
    ).withColumnRenamed("stars", "prediction")
    truth = test.withColumnRenamed("stars", "truth_stars")
    joined = preds.join(truth, ["user_id", "business_id"])
    from pyspark.sql import functions as F

    rmse_hybrid = float(
        joined.agg(
            F.sqrt(
                F.avg(
                    (F.col("prediction") - F.col("truth_stars")) ** 2
                )
            ).alias("r")
        ).collect()[0]["r"]
    )
    # strict ordering with margin: a healthy blend extrapolates the
    # planted structure well below the uninformative-averages floor
    assert rmse_hybrid < 0.75 * rmse_base, (rmse_hybrid, rmse_base)
