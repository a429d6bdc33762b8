"""Recommender-semantics golden tests on Yelp-shaped fixtures
(FIXTURES.md): cold-start ladders, decision tags, duplicate handling,
zero-variance Pearson, evaluator NaN exclusion, eval-grammar attribute
parsing — the reference behaviors SURVEY.md §5 says our suite must pin.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

from yelp_recommender_spark import fixtures as FX


@pytest.fixture(scope="module")
def train(spark):  # noqa: F811
    return FX.train_reviews_df(spark)


@pytest.fixture(scope="module")
def avgs(train):
    from yelp_recommender_spark.models.baseline import fit_avgs

    return fit_avgs(train)


def _by_pair(rows):
    return {(r.user_id, r.business_id): r for r in rows}


# ---------------------------------------------------------------- baseline
def test_baseline_cold_start_ladder(spark, train, avgs):  # noqa: F811
    from yelp_recommender_spark.models.baseline import predict_baseline

    got = _by_pair(
        predict_baseline(FX.test_pairs_df(spark), *avgs).collect()
    )
    # u1 avg = (5+3+1)/3 = 3.0 ; b1 avg = (5+4+5+3)/4 = 4.25
    assert got[("u1", "b2")].decision == "both_avg"
    r = got[("u1", "b_new")]
    assert (r.decision, r.stars) == ("usr_avg", 3.0)
    r = got[("u_new", "b1")]
    assert (r.decision, r.stars) == ("biz_avg", 4.25)
    r = got[("u_new", "b_new")]
    assert (r.decision, r.stars) == ("default", 2.5)


# ---------------------------------------------------------------- evaluator
def test_rmse_excludes_missing_and_nan(spark):  # noqa: F811
    from yelp_recommender_spark.models.evaluator import rmse

    preds = spark.createDataFrame(
        [
            ("u1", "b1", 3.0),
            ("u2", "b2", float("nan")),  # NaN → excluded (evaluate.py:93-96)
            # (u3, b3) missing entirely → excluded
        ],
        "user_id string, business_id string, stars double",
    )
    truth = spark.createDataFrame(
        [("u1", "b1", 5.0), ("u2", "b2", 1.0), ("u3", "b3", 4.0)],
        "user_id string, business_id string, stars double",
    )
    row = rmse(preds, truth).collect()[0]
    assert row.n_scored == 1 and row.n_missing == 2
    assert row.rmse == 2.0  # |3-5| on the single scored pair


def test_rmse_by_decision_breakdown(spark, train, avgs):  # noqa: F811
    from yelp_recommender_spark.models.baseline import predict_baseline
    from yelp_recommender_spark.models.evaluator import rmse_by_decision

    preds = predict_baseline(FX.test_pairs_df(spark), *avgs)
    rows = {r.decision: r for r in rmse_by_decision(preds, FX.test_truth_df(spark)).collect()}
    assert set(rows) == {"both_avg", "usr_avg", "biz_avg", "default"}
    assert rows["default"].rmse == 1.5  # pred 2.5 vs truth 1.0


# ---------------------------------------------------------------- CF engine
def test_corated_weights_semantics(train):
    from yelp_recommender_spark.models.cf import corated_weights

    w = {
        (r.e1, r.e2): r
        for r in corated_weights(
            train, "business_id", "user_id", min_corated=2
        ).collect()
    }
    # b1-b2 co-rated by u1..u4 (4 common users)
    assert w[("b1", "b2")].n_common == 4
    # u4's duplicate b2 ratings (3,5) dedup to mean 4.0; vectors are then
    # b1: [5,4,5,3] b2: [3,2,5,4] over u1..u4 → hand-check pearson sign
    assert -1.0 <= w[("b1", "b2")].pearson <= 1.0
    # jaccard: raters(b1)={u1..u4}, raters(b2)={u1..u4} → 4/4 = 1.0
    assert w[("b1", "b2")].jaccard == 1.0
    # zero-variance guard: pairs involving a constant-rating vector → 0.0
    # (b1,b3): common raters u1,u2 → b1=[5,4], b3=[1,2] → corr = -1
    assert w[("b1", "b3")].pearson == -1.0


def test_corated_cap_bounds_hot_context_pairs(spark):  # noqa: F811
    """cap_per_context is the skew guard for the CF self-join: a
    power-law context (one user rating everything) contributes
    |ratings|² pairs uncapped; with the cap its contribution is bounded
    by cap², keeping the context's top-rated entities deterministically."""
    from yelp_recommender_spark.models.cf import corated_weights

    # one hot user rated 40 businesses; two normal users rated 2 each
    rows = [("hot", f"b{i}", float(1 + i % 5)) for i in range(40)]
    rows += [("u1", "b0", 4.0), ("u1", "b1", 3.0),
             ("u2", "b0", 2.0), ("u2", "b2", 5.0)]
    train = spark.createDataFrame(
        rows, "user_id string, business_id string, stars double"
    )
    uncapped = corated_weights(train, min_corated=1).count()
    assert uncapped >= 40 * 39 // 2  # the hot user's quadratic blowup
    capped = corated_weights(train, min_corated=1, cap_per_context=5)
    n_capped = capped.count()
    assert n_capped <= 5 * 4 // 2 + 4  # bounded by cap² per context
    # the cap keeps the TOP-rated entities: stars 5 ranks before 1
    kept_entities = {
        r.e1 for r in capped.collect()
    } | {r.e2 for r in capped.collect()}
    top_rated = {f"b{i}" for i in range(40) if (1 + i % 5) == 5}
    assert top_rated & kept_entities, "no top-rated entity survived the cap"


def test_item_cf_predict_falls_back(spark, train, avgs):  # noqa: F811
    from yelp_recommender_spark.models.cf import (
        corated_weights,
        predict_item_cf,
        top_n_neighbors,
    )

    weights = corated_weights(train, "business_id", "user_id", min_corated=2)
    neigh = top_n_neighbors(weights, "pearson", n=5)
    got = _by_pair(
        predict_item_cf(
            FX.test_pairs_df(spark), train, neigh, *avgs
        ).collect()
    )
    assert got[("u_new", "b_new")].decision == "default"
    assert got[("u_new", "b_new")].stars == 2.5
    # u5 rated only b4 (no neighbors of b1 rated by u5) → usr_avg 4.0
    assert got[("u5", "b1")].decision == "usr_avg"
    assert got[("u5", "b1")].stars == 4.0
    # CF scored the seen/seen pair; Σw·r/Σ|w| with negative pearson
    # weights may leave [1,5] — reference parity: no clipping
    # (item_cf_model.py:356-366)
    assert got[("u1", "b2")].decision == "cf"
    assert not math.isnan(got[("u1", "b2")].stars)


def test_user_cf_mean_centered(spark, train, avgs):  # noqa: F811
    from yelp_recommender_spark.models.cf import (
        corated_weights,
        predict_user_cf,
        top_n_neighbors,
    )

    weights = corated_weights(train, "user_id", "business_id", min_corated=2)
    neigh = top_n_neighbors(weights, "pearson", n=5)
    got = _by_pair(
        predict_user_cf(FX.test_pairs_df(spark), train, neigh, *avgs).collect()
    )
    assert got[("u_new", "b_new")].stars == 2.5
    assert all(r.decision in {"cf", "usr_avg", "biz_avg", "default"} for r in got.values())


def test_lsh_candidates_cover_heavy_overlap(train):
    from yelp_recommender_spark.models.cf import lsh_candidate_pairs

    pairs = {
        (r.e1, r.e2)
        for r in lsh_candidate_pairs(
            train, "business_id", "user_id", n_hashes=32, bands=16,
            min_jaccard=0.01,
        ).collect()
    }
    # b1/b2 share all four raters (jaccard 1.0) — LSH must surface them
    assert ("b1", "b2") in pairs


# ---------------------------------------------------------------- content
def test_content_predict_decisions_and_range(spark, train, avgs):  # noqa: F811
    from yelp_recommender_spark.models.content_based import (
        fit_content,
        predict_content,
    )

    profiles = fit_content(train, top_k=20, min_df=0, variant="onehot")
    got = _by_pair(
        predict_content(
            FX.test_pairs_df(spark), profiles, *avgs, rule="geometric"
        ).collect()
    )
    assert got[("u_new", "b_new")].decision == "default"
    assert got[("u1", "b2")].decision == "cos"
    # geometric rule stays within [min(ū,b̄), max(ū,b̄)]
    r = got[("u1", "b2")]
    assert 2.0 <= r.stars <= 3.5


def test_content_continuous_variant_runs(spark, train, avgs):  # noqa: F811
    from yelp_recommender_spark.models.content_based import (
        fit_content,
        predict_content,
    )

    profiles = fit_content(train, top_k=20, min_df=0, variant="continuous")
    rows = predict_content(
        FX.test_pairs_df(spark), profiles, *avgs, rule="linear"
    ).collect()
    assert len(rows) == len(FX.TEST_PAIRS)
    assert all(not math.isnan(r.stars) for r in rows)


# ------------------------------------------------------------ extended model
def test_attribute_encoding_without_eval(spark):  # noqa: F811
    from yelp_recommender_spark.models.extended_content import (
        encode_business_features,
    )

    feats = {
        (r.business_id, r.feature): r.value
        for r in encode_business_features(FX.businesses_df(spark)).collect()
    }
    # ordinals: index+1 in the reference value lists
    assert feats[("b1", "attr:Alcohol")] == 3.0          # 'full_bar'
    assert feats[("b2", "attr:Alcohol")] == 2.0          # 'beer_and_wine'
    assert feats[("b1", "attr:NoiseLevel")] == 3.0       # 'loud'
    assert feats[("b4", "attr:NoiseLevel")] == 1.0       # 'quiet'
    # booleans: int(v)+1
    assert feats[("b1", "attr:GoodForKids")] == 2.0      # True
    assert feats[("b2", "attr:GoodForKids")] == 1.0      # False
    # nested dict grammar parsed without eval
    assert feats[("b1", "attr:GoodForMeal_lunch")] == 2.0
    assert feats[("b1", "attr:GoodForMeal_dessert")] == 1.0
    assert feats[("b1", "attr:Music_live")] == 2.0
    # 'None' scalar and unknown ordinal are skipped
    assert ("b1", "attr:OutdoorSeating") not in feats
    assert ("b5", "attr:Alcohol") not in feats
    # categories one-hot
    assert feats[("b1", "cat:Mexican")] == 1.0
    assert ("b5", "cat:") not in feats


def test_extended_fit_predict(spark, train, avgs):  # noqa: F811
    from yelp_recommender_spark.models.extended_content import (
        fit_extended,
        predict_extended,
    )

    model = fit_extended(train, FX.businesses_df(spark), top_k=20)
    # user profile divides the element-wise sum by the rated-business
    # count (reference average_vects): u1 rated b1,b2,b3 →
    # cat:Restaurants in all three → 1.0; cat:Mexican only in b1 → 1/3
    up = {
        (r.user_id, r.feature): r.value
        for r in model["user_profile"].collect()
    }
    assert up[("u1", "cat:Restaurants")] == 1.0
    assert abs(up[("u1", "cat:Mexican")] - 1.0 / 3.0) < 1e-12
    got = _by_pair(
        predict_extended(FX.test_pairs_df(spark), model, *avgs).collect()
    )
    assert got[("u_new", "b_new")].stars == 2.5
    assert got[("u1", "b2")].decision == "cos"


def test_user_counter_encoding(spark):  # noqa: F811
    from yelp_recommender_spark.models.extended_content import (
        encode_user_features,
    )

    feats = {
        (r.user_id, r.feature): r.value
        for r in encode_user_features(FX.users_df(spark)).collect()
    }
    assert feats[("u1", "usr:funny")] == 10.0
    assert ("u4", "usr:funny") not in feats  # zero rows dropped


# ---------------------------------------------------------------- ALS/hybrid
def test_als_and_hybrid_end_to_end(spark):  # noqa: F811
    from yelp_recommender_spark.models.als_hybrid import (
        hybrid_features,
        predict_als,
        predict_hybrid,
        train_als,
        train_hybrid_regressor,
    )
    from yelp_recommender_spark.models.baseline import fit_avgs

    # numeric-id ratings (ALS needs ints)
    train = spark.createDataFrame(
        [(u, b, float(1 + (u * b) % 5)) for u in range(1, 9) for b in range(1, 7)],
        "user_id int, business_id int, stars double",
    )
    test = spark.createDataFrame(
        [(1, 2), (99, 1), (99, 99)], "user_id int, business_id int"
    )
    user_avg, biz_avg = fit_avgs(train)
    model = train_als(train, rank=4, reg=0.1, max_iter=5)
    got = _by_pair(predict_als(model, test, user_avg, biz_avg).collect())
    assert got[(1, 2)].decision == "als"
    assert got[(99, 1)].decision == "biz_avg"
    assert got[(99, 99)].decision == "default" and got[(99, 99)].stars == 2.5

    feats = hybrid_features(model, train, user_avg, biz_avg, 3.0).join(
        train, ["user_id", "business_id"]
    )
    reg = train_hybrid_regressor(feats)
    preds = predict_hybrid(
        reg, hybrid_features(model, test, user_avg, biz_avg, 3.0)
    ).collect()
    assert len(preds) == 3
    assert all(r.decision == "hybrid" for r in preds)


def test_als_grid_picks_best_config(spark):  # noqa: F811
    """Grid search must sweep every (rank, reg) combo and select the one
    with minimal validation RMSE — a crushing regParam (5.0 shrinks all
    factors to ~0, predicting ~0 stars) can never win over a sane one."""
    from yelp_recommender_spark.models.als_hybrid import (
        train_als_grid,
        val_split,
    )

    ratings = spark.createDataFrame(
        [
            (u, b, float(1 + (u * 7 + b * 3) % 5))
            for u in range(1, 21)
            for b in range(1, 13)
        ],
        "user_id int, business_id int, stars double",
    )
    tr, val = val_split(ratings)
    # the deterministic hash gate actually splits, disjointly
    assert 0 < val.count() < ratings.count()
    assert tr.count() + val.count() == ratings.count()

    got = train_als_grid(
        ratings, ranks=(2, 4), regs=(0.05, 5.0), max_iter=5
    )
    assert len(got["selection"]) == 4
    assert {(r["rank"], r["reg"]) for r in got["selection"]} == {
        (2, 0.05), (2, 5.0), (4, 0.05), (4, 5.0)
    }
    assert got["reg"] == 0.05
    scored = [r for r in got["selection"] if r["val_rmse"] is not None]
    assert got["val_rmse"] == min(r["val_rmse"] for r in scored)
    # the returned model is the winning fit, usable directly
    assert got["model"].rank == got["rank"]


def test_top_n_neighbors_mean_mode(spark):  # noqa: F811
    """A12: weight_col='mean' ranks by (pearson+cosine+jaccard)/3
    (reference item_cf_model.py:178-180)."""
    from yelp_recommender_spark.models.cf import top_n_neighbors

    weights = spark.createDataFrame(
        [
            ("a", "b", 3, 1.0, 0.2, 0.3),   # mean = 0.5
            ("a", "c", 3, 0.1, 0.9, 0.8),   # mean = 0.6 → better for a
        ],
        "e1 string, e2 string, n_common int, pearson double,"
        " cosine double, jaccard double",
    )
    by_pearson = {
        r.e2: r.w
        for r in top_n_neighbors(weights, "pearson", n=1)
        .filter("e1 = 'a'")
        .collect()
    }
    assert by_pearson == {"b": 1.0}
    by_mean = {
        r.e2: r.w
        for r in top_n_neighbors(weights, "mean", n=1)
        .filter("e1 = 'a'")
        .collect()
    }
    assert by_mean == {"c": 0.6}


def test_describe_stats(spark):  # noqa: F811
    """A13: RDD .stats()-style diagnostics — count/mean/population
    stddev/min/max per numeric column, NaN excluded, one job."""
    from yelp_recommender_spark.models.evaluator import describe_stats

    df = spark.createDataFrame(
        [
            (1.0, 10, "x"),
            (2.0, 20, "y"),
            (3.0, 30, "z"),
            (float("nan"), 40, "w"),
        ],
        "v double, k int, s string",
    )
    got = {r.column: r for r in describe_stats(df).collect()}
    assert set(got) == {"v", "k"}  # string column skipped
    assert (got["v"].n, got["v"].mean, got["v"].min, got["v"].max) == (
        3, 2.0, 1.0, 3.0,
    )
    assert got["v"].stddev == round((2 / 3) ** 0.5, 6)  # population stdev
    assert (got["k"].n, got["k"].mean) == (4, 25.0)


def test_hybrid_labels_deduplicated(spark):  # noqa: F811
    """ADVICE r2 #4: a (user, biz) pair rated twice with DIFFERENT stars
    must contribute ONE label row (mean), not two conflicting rows —
    same composition the q57/cli hybrid train paths now use."""
    from yelp_recommender_spark.models.als_hybrid import (
        hybrid_features,
        train_als,
    )
    from yelp_recommender_spark.models.baseline import fit_avgs
    from yelp_recommender_spark.models.cf import dedup_ratings

    train = spark.createDataFrame(
        [(1, 1, 1.0), (1, 1, 5.0), (1, 2, 4.0), (2, 1, 2.0), (2, 2, 3.0)],
        "user_id int, business_id int, stars double",
    )
    user_avg, biz_avg = fit_avgs(train)
    model = train_als(train, rank=2, reg=0.1, max_iter=1)
    feats = hybrid_features(
        model, train.select("user_id", "business_id"), user_avg, biz_avg, 3.0
    ).join(dedup_ratings(train, "business_id", "user_id"),
           ["user_id", "business_id"])
    rows = {(r.user_id, r.business_id): r.stars for r in feats.collect()}
    assert len(rows) == 4  # 4 distinct pairs, not 5 label rows
    assert rows[(1, 1)] == 3.0  # mean of the conflicting 1.0 / 5.0
