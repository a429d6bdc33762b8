"""Unit tests for the explicit skew-handling operators: salted join and
two-stage salted aggregation must be result-identical to their plain
counterparts while actually spreading hot keys. Oracle-level coverage is
q71 in test_queries_vs_oracle.py."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def skewed(spark):  # noqa: F811
    """1000 rows on one whale key + a handful elsewhere + an unmatched key."""
    rows = [(1, float(i)) for i in range(1000)]
    rows += [(2, 10.0), (2, 20.0), (3, 7.0), (99, 1.0)]
    return spark.createDataFrame(rows, "k long, v double")


@pytest.fixture(scope="module")
def dim(spark):  # noqa: F811
    return spark.createDataFrame(
        [(1, "whale"), (2, "small"), (3, "tiny"), (4, "unused")],
        "k long, label string",
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner_and_left(skewed, dim):
    from yelp_recommender_spark.operators.skew import salted_join

    for how in ("inner", "left"):
        plain = skewed.join(dim, "k", how)
        salted = salted_join(skewed, dim, "k", n_salts=4, how=how)
        assert sorted(salted.columns) == sorted(plain.columns)
        assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_join_semi_and_anti(skewed, dim):
    from yelp_recommender_spark.operators.skew import salted_join

    semi = salted_join(skewed, dim, "k", n_salts=4, how="left_semi")
    anti = salted_join(skewed, dim, "k", n_salts=4, how="left_anti")
    assert semi.count() == 1003  # all but the unmatched k=99 row
    assert _sorted(anti) == [(99, 1.0)]


def test_salted_join_rejects_right_outer(skewed, dim):
    from yelp_recommender_spark.operators.skew import salted_join

    with pytest.raises(ValueError, match="duplicate"):
        salted_join(skewed, dim, "k", how="right")


def test_salt_is_deterministic_and_spreads_the_whale(skewed):
    from yelp_recommender_spark.operators.skew import with_salt

    a = with_salt(skewed, 4, cols=["k", "v"])
    b = with_salt(skewed, 4, cols=["k", "v"])
    assert _sorted(a) == _sorted(b)  # retry-safe: same rows → same salts
    whale_salts = {
        r._salt for r in a.filter("k = 1").select("_salt").collect()
    }
    assert len(whale_salts) == 4  # the hot key actually fans out
    assert all(0 <= s < 4 for s in whale_salts)


def test_salted_aggregate_matches_plain(spark, skewed):  # noqa: F811
    from pyspark.sql import functions as F

    from yelp_recommender_spark.functions.exact_agg import davg, dsum
    from yelp_recommender_spark.operators.skew import salted_aggregate

    plain = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("v").alias("total"),
        davg("v").alias("mean"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    salted = salted_aggregate(
        skewed,
        ["k"],
        {
            "n": ("*", "count"),
            "total": ("v", "dsum"),
            "mean": ("v", "avg"),
            "lo": ("v", "min"),
            "hi": ("v", "max"),
        },
        n_salts=8,
    )
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_aggregate_rejects_non_decomposable(skewed):
    from yelp_recommender_spark.operators.skew import salted_aggregate

    with pytest.raises(ValueError, match="unsupported"):
        salted_aggregate(skewed, ["k"], {"d": ("v", "count_distinct")})


# ------------------------------------------------------- auto (detect) mode
def test_auto_aggregate_plants_whale_flips_plan(spark, skewed):  # noqa: F811
    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.skew import (
        _plain_aggregate,
        salted_aggregate,
    )

    aggs = {
        "n": ("*", "count"),
        "total": ("v", "dsum"),
        "mean": ("v", "avg"),
        "lo": ("v", "min"),
    }
    expected = sorted(
        tuple(r) for r in _plain_aggregate(skewed, ["k"], aggs).collect()
    )

    # planted whale (key 1 holds ~99.6% of rows) above a lowered floor:
    # the guard ENGAGES and the two-stage plan runs
    whale_out = {}
    got = salted_aggregate(
        skewed, ["k"], aggs,
        n_salts="auto", whale_min_rows=100, decision_out=whale_out,
    )
    assert whale_out["plan"] == "salted" and whale_out["engaged"]
    assert whale_out["max_frac_hi"] >= 0.9
    assert sorted(tuple(r) for r in got.collect()) == expected

    # uniform keys: untouched — the one-stage plan runs, same results
    uni = spark.range(2_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").cast("double").alias("v")
    )
    uni_expected = sorted(
        tuple(r) for r in _plain_aggregate(uni, ["k"], aggs).collect()
    )
    uni_out = {}
    got = salted_aggregate(
        uni, ["k"], aggs,
        n_salts="auto", whale_min_rows=100, decision_out=uni_out,
    )
    assert uni_out["plan"] == "plain" and not uni_out["engaged"]
    assert sorted(tuple(r) for r in got.collect()) == uni_expected

    # default floor sits ABOVE the measured range: the planted whale
    # alone does not engage it (the r6 negative is the default)
    dflt = {}
    salted_aggregate(skewed, ["k"], aggs, n_salts="auto", decision_out=dflt)
    assert dflt["plan"] == "plain"


def test_auto_join_plants_whale_flips_plan(spark, skewed, dim):  # noqa: F811
    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.skew import salted_join

    expected = sorted(tuple(r) for r in skewed.join(dim, "k").collect())

    whale_out = {}
    got = salted_join(
        skewed, dim, "k",
        n_salts="auto", whale_min_rows=100, decision_out=whale_out,
    )
    assert whale_out["plan"] == "salted"
    assert sorted(tuple(r) for r in got.select("k", "v", "label").collect()) \
        == expected

    uni = spark.range(2_000).select(
        (F.col("id") % 4 + 1).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    # 4 keys at 25% each: above whale_frac=0.10 but below the row floor
    uni_out = {}
    got = salted_join(
        uni, dim, "k",
        n_salts="auto", whale_min_rows=10_000, decision_out=uni_out,
    )
    assert uni_out["plan"] == "plain"
    assert got.count() == uni.join(dim, "k").count()


def test_auto_rejects_garbage_n_salts(skewed, dim):
    from yelp_recommender_spark.operators.skew import (
        salted_aggregate,
        salted_join,
    )

    with pytest.raises(ValueError, match="n_salts"):
        salted_aggregate(skewed, ["k"], {"n": ("*", "count")}, n_salts="yes")
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(skewed, dim, "k", n_salts="detect")
