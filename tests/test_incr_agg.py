"""Incremental aggregate maintenance (operators/incr_agg.py): maintained
state must equal a from-scratch recompute, including vanished and
newly-appearing groups, and stay DECIMAL-exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


def _collect(df):
    return {
        tuple(r[k] for k in ("k",)): (r.n, float(r.sum_v))
        for r in df.collect()
    }


def test_merge_matches_recompute(spark):  # noqa: F811
    from yelp_recommender_spark.operators.incr_agg import (
        agg_state,
        merge_deltas,
    )

    base = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", 10.0), ("c", 0.25)],
        "k string, v double",
    )
    # deltas: insert into existing group, delete entire group c,
    # insert a brand-new group d
    deltas = spark.createDataFrame(
        [
            ("a", 4.0, 1),
            ("c", 0.25, -1),
            ("d", 7.0, 1),
            ("d", 8.0, 1),
        ],
        "k string, v double, sign int",
    )
    state = agg_state(base, ["k"], ["v"])
    merged = merge_deltas(state, deltas, ["k"], ["v"]).select(
        "k", "n", merged_sum("v")
    )

    updated = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("a", 4.0), ("b", 10.0), ("d", 7.0), ("d", 8.0)],
        "k string, v double",
    )
    recomputed = agg_state(updated, ["k"], ["v"]).select(
        "k", "n", merged_sum("v")
    )
    got = _collect(merged)
    assert got == _collect(recomputed)
    assert ("c",) not in got  # fully-retracted group is gone


def merged_sum(c):
    from pyspark.sql import functions as F

    return F.col(f"sum_{c}").cast("double").alias("sum_v")


def test_group_vanishes_when_count_hits_zero(spark):  # noqa: F811
    from yelp_recommender_spark.operators.incr_agg import (
        agg_state,
        merge_deltas,
    )

    base = spark.createDataFrame([("x", 1.0)], "k string, v double")
    deltas = spark.createDataFrame(
        [("x", 1.0, -1)], "k string, v double, sign int"
    )
    out = merge_deltas(agg_state(base, ["k"], ["v"]), deltas, ["k"], ["v"])
    assert out.count() == 0


def test_empty_delta_feed_is_identity(spark):  # noqa: F811
    from yelp_recommender_spark.operators.incr_agg import (
        agg_state,
        merge_deltas,
    )

    base = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, v double"
    )
    deltas = spark.createDataFrame([], "k string, v double, sign int")
    state = agg_state(base, ["k"], ["v"])
    out = merge_deltas(state, deltas, ["k"], ["v"])
    assert _collect(out.select("k", "n", merged_sum("v"))) == _collect(
        state.select("k", "n", merged_sum("v"))
    )


def test_all_null_measures_yield_null_sum_like_recompute(spark):  # noqa: F811
    """ADVICE r4: a surviving key whose measure values are all NULL must
    maintain sum = NULL (SQL SUM semantics), not 0 — bit-identical to a
    from-scratch recompute of the updated fact set."""
    from yelp_recommender_spark.operators.incr_agg import (
        agg_state,
        merge_deltas,
    )

    base = spark.createDataFrame(
        [("a", 5.0), ("a", None), ("b", None)], "k string, v double"
    )
    # retract a's only non-null row; insert another NULL row for b
    deltas = spark.createDataFrame(
        [("a", 5.0, -1), ("b", None, 1)], "k string, v double, sign int"
    )
    maintained = merge_deltas(
        agg_state(base, ["k"], ["v"]), deltas, ["k"], ["v"]
    )
    updated_facts = spark.createDataFrame(
        [("a", None), ("b", None), ("b", None)], "k string, v double"
    )
    recomputed = agg_state(updated_facts, ["k"], ["v"])
    cols = ["k", "n", "nn_v", "sum_v"]
    got = sorted(
        maintained.select("k", "n", "nn_v", F.col("sum_v")).collect()
    )
    want = sorted(
        recomputed.select("k", "n", "nn_v", F.col("sum_v")).collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert all(r.sum_v is None for r in got)  # the SQL-SUM NULL answer
