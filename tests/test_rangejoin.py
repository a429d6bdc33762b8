"""Bucketized range join: inclusive boundaries, exactly-once emission
across bucket-spanning intervals, empty-interval drop — and the plan
guarantee (hash equi-join, not a nested loop)."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def test_range_join_semantics(spark):  # noqa: F811
    from yelp_recommender_spark.operators.rangejoin import range_join_points

    points = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 25), ("a", 3, 99), ("b", 4, 10)],
        "k string, pid long, pt long",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 100, 5, 30),    # spans 3 buckets at width 10
            ("a", 101, 10, 10),   # degenerate single-point interval
            ("a", 102, 50, 40),   # end < start → empty, dropped
            ("b", 103, 0, 9),     # ends just before b's point
        ],
        "k string, iid long, s long, e long",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_points(
            points, intervals, keys=["k"], pt_col="pt",
            start_col="s", end_col="e", bucket_width=10,
        ).collect()
    }
    assert got == {
        (1, 100),  # 10 ∈ [5, 30]
        (1, 101),  # boundaries inclusive both sides: 10 ∈ [10, 10]
        (2, 100),  # 25 ∈ [5, 30] — interval crosses buckets, ONE row
    }
    with pytest.raises(ValueError):
        range_join_points(
            points, intervals, ["k"], "pt", "s", "e", bucket_width=0
        )


def test_range_join_plans_a_hash_join(spark):  # noqa: F811
    """The whole point vs the raw inequality join: the bucketized form
    must plan as a key equi-join, never BroadcastNestedLoopJoin."""
    from yelp_recommender_spark.operators.rangejoin import range_join_points

    points = spark.range(100).selectExpr(
        "'k' as k", "id as pid", "id * 7 as pt"
    )
    intervals = spark.range(20).selectExpr(
        "'k' as k", "id as iid", "id * 30 as s", "id * 30 + 45 as e"
    )
    out = range_join_points(
        points, intervals, ["k"], "pt", "s", "e", bucket_width=50
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # sanity: results match the naive formulation
    naive = points.join(intervals, "k").filter("s <= pt and pt <= e")
    assert sorted((r.pid, r.iid) for r in out.collect()) == sorted(
        (r.pid, r.iid) for r in naive.collect()
    )


def test_auto_bucket_width_caps_outlier_explode(spark):  # noqa: F811
    """VERDICT r4: the width must come from the interval-length stats —
    median-sized for typical spans, widened so one whole-history outlier
    explodes to at most max_explode buckets."""
    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.rangejoin import (
        auto_bucket_width,
        range_join_points,
    )

    # 99 short spans (length 10) + one 100_000-long outlier
    rows = [(1, i * 100, i * 100 + 10) for i in range(99)]
    rows.append((1, 0, 100_000))
    iv = spark.createDataFrame(rows, "k long, s long, e long")
    w = auto_bucket_width(iv, "s", "e", max_explode=64)
    assert w >= 100_000 // 64  # cap binds: outlier explodes to <= 64+1
    assert w <= 100_000  # but not degenerate single-bucket-for-everything

    # correctness with the derived width: every point in every covering
    # span, exactly once (three probe points, hand-checked)
    pts = spark.createDataFrame(
        [(1, 5), (1, 105), (1, 99_999)], "k long, p long"
    )
    got = sorted(
        tuple(r)
        for r in range_join_points(
            pts, iv, keys=["k"], pt_col="p", start_col="s", end_col="e"
        )
        .select("p", "s", "e")
        .collect()
    )
    assert got == [
        (5, 0, 10),        # first short span
        (5, 0, 100_000),   # outlier covers everything
        (105, 0, 100_000),
        (105, 100, 110),
        (99_999, 0, 100_000),
    ]


def test_auto_bucket_width_empty_intervals(spark):  # noqa: F811
    from yelp_recommender_spark.operators.rangejoin import auto_bucket_width

    iv = spark.createDataFrame([], "k long, s long, e long")
    assert auto_bucket_width(iv, "s", "e") == 1
