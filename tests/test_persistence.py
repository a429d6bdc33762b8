"""Model persistence round-trips (SURVEY.md §2.1 S7-S10): for every
trained artifact, reload-then-predict must equal train-then-predict
bit-for-bit — the reference's save/load lifecycle
(``/root/reference/models/content_based_model.py:380-478``,
``item_cf_model.py:194,223-225``, ``scripts/predict_als.py:92-93``,
``scripts/train_hybrid.py:108-110``) restated over Parquet + native
Spark ML persistence.

Also pins the string-ID ALS path (W3): the synthetic star schema has
numeric ids, but real Yelp ids are strings — ``train_als_indexed`` must
handle them and route unseen ids to the cold-start ladder.
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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- averages
def test_avgs_roundtrip(spark, train, avgs, tmp_path):  # noqa: F811
    from yelp_recommender_spark.models.baseline import predict_baseline
    from yelp_recommender_spark.models.persistence import load_avgs, save_avgs

    path = str(tmp_path / "avgs_model")
    save_avgs(path, *avgs)
    loaded = load_avgs(spark, path)
    test = FX.test_pairs_df(spark)
    assert _rows(predict_baseline(test, *loaded)) == _rows(
        predict_baseline(test, *avgs)
    )


# ------------------------------------------------------------- content model
def test_content_model_roundtrip(spark, train, avgs, tmp_path):  # noqa: F811
    from yelp_recommender_spark.models.content_based import (
        fit_content,
        predict_content,
    )
    from yelp_recommender_spark.models.persistence import (
        load_content_model,
        save_content_model,
    )

    model = fit_content(train, top_k=20)
    path = str(tmp_path / "content_model")
    save_content_model(path, model)
    loaded = load_content_model(spark, path)
    assert set(loaded) >= {"vocab", "biz_profile", "user_profile"}
    test = FX.test_pairs_df(spark)
    assert _rows(predict_content(test, loaded, *avgs)) == _rows(
        predict_content(test, model, *avgs)
    )


# ------------------------------------------------------------ extended model
def test_extended_model_roundtrip(spark, train, avgs, tmp_path):  # noqa: F811
    from yelp_recommender_spark.models.extended_content import (
        fit_extended,
        predict_extended,
    )
    from yelp_recommender_spark.models.persistence import (
        load_model,
        save_model,
    )

    model = fit_extended(train, FX.businesses_df(spark), top_k=20)
    path = str(tmp_path / "extended_model")
    save_model(path, tables=model)
    loaded = load_model(spark, path)
    test = FX.test_pairs_df(spark)
    assert _rows(predict_extended(test, loaded, *avgs)) == _rows(
        predict_extended(test, model, *avgs)
    )


# --------------------------------------------------------------- CF weights
def test_cf_weights_roundtrip(spark, train, avgs, tmp_path):  # noqa: F811
    from yelp_recommender_spark.models.cf import (
        corated_weights,
        predict_item_cf,
        top_n_neighbors,
    )
    from yelp_recommender_spark.models.persistence import (
        load_cf_weights,
        save_cf_weights,
    )

    weights = corated_weights(train, min_corated=2)
    neighbors = top_n_neighbors(weights, "pearson", n=10)
    path = str(tmp_path / "cf_model")
    # the persisted artifact is the pruned neighbor table — what predict
    # consumes (reference saves the weight CSV at item_cf_model.py:194)
    save_cf_weights(path, neighbors)
    loaded = load_cf_weights(spark, path)
    test = FX.test_pairs_df(spark)
    assert _rows(predict_item_cf(test, train, loaded, *avgs)) == _rows(
        predict_item_cf(test, train, neighbors, *avgs)
    )


# ------------------------------------------------------- ALS with string ids
def test_als_indexed_string_ids_roundtrip(spark, train, avgs, tmp_path):  # noqa: F811
    from yelp_recommender_spark.models.als_hybrid import (
        predict_als_indexed,
        train_als_indexed,
    )
    from yelp_recommender_spark.models.persistence import (
        load_model,
        save_model,
    )

    # fixture ids are strings ("u1", "b2") — the reference's real shape
    bundle = train_als_indexed(train, rank=4, max_iter=5)
    test = FX.test_pairs_df(spark)
    direct = predict_als_indexed(bundle, test, *avgs)
    got = {(r.user_id, r.business_id): r for r in direct.collect()}
    # seen (user, item) → a real ALS score, tagged als
    assert got[("u1", "b2")].decision == "als"
    assert not math.isnan(got[("u1", "b2")].stars)
    # unseen user routes through the ladder, never NaN
    assert got[("u_new", "b1")].decision == "biz_avg"
    assert got[("u_new", "b_new")].decision == "default"
    assert got[("u_new", "b_new")].stars == 2.5

    path = str(tmp_path / "als_model")
    save_model(path, ml=bundle)
    loaded = load_model(spark, path)
    assert _rows(predict_als_indexed(loaded, test, *avgs)) == _rows(direct)


# ------------------------------------------------------------- hybrid (GBT)
def test_hybrid_regressor_roundtrip(spark, tmp_path):  # noqa: F811
    from pyspark.sql import functions as F

    from yelp_recommender_spark.models.als_hybrid import (
        hybrid_features,
        predict_hybrid,
        train_als,
        train_hybrid_regressor,
    )
    from yelp_recommender_spark.models.baseline import fit_avgs
    from yelp_recommender_spark.models.persistence import (
        load_model,
        save_model,
    )

    ratings = spark.createDataFrame(
        [(u, b, float(2 + (u * b) % 4)) for u in range(1, 8) for b in range(1, 6)],
        "user_id int, business_id int, stars double",
    )
    user_avg, biz_avg = fit_avgs(ratings)
    gmean = ratings.agg(F.avg("stars")).head()[0]
    als = train_als(ratings, rank=3, max_iter=5)
    feats = hybrid_features(
        als, ratings, user_avg, biz_avg, gmean
    ).join(ratings, ["user_id", "business_id"])
    reg = train_hybrid_regressor(feats)

    path = str(tmp_path / "hybrid_model")
    save_model(path, ml={"als": als, "blend": reg})
    loaded = load_model(spark, path)
    test_feats = hybrid_features(
        loaded["als"], ratings, user_avg, biz_avg, gmean
    )
    direct_feats = hybrid_features(als, ratings, user_avg, biz_avg, gmean)
    assert _rows(predict_hybrid(loaded["blend"], test_feats)) == _rows(
        predict_hybrid(reg, direct_feats)
    )
