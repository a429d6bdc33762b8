"""as-of join unit semantics: backward match, equal-ts ties, no-match
nulls, tolerance aging — the q65 oracle (DuckDB native ASOF JOIN)
verifies it at table scale; these pin the edge rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


def _run(spark, tolerance=None):  # noqa: F811
    from yelp_recommender_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            ("a", 10, "l1"),
            ("a", 20, "l2"),
            ("a", 5, "l0"),   # before any right row → null
            ("b", 7, "l3"),   # tie: right row at exactly 7 matches
            ("c", 9, "l4"),   # key with no right rows at all
        ],
        "k string, ts long, payload string",
    )
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 15, 2.0), ("b", 7, 3.0)],
        "k string, ts long, v double",
    )
    got = asof_join(
        left, right, keys=["k"], ts_col="ts", value_cols=["v"],
        tolerance=tolerance,
    )
    return {r.payload: r.v_asof for r in got.collect()}, got


def test_asof_backward_semantics(spark):  # noqa: F811
    vals, got = _run(spark)
    assert vals == {
        "l0": None,  # nothing at-or-before ts=5
        "l1": 1.0,   # latest right ≤ 10 is ts=8
        "l2": 2.0,   # latest right ≤ 20 is ts=15
        "l3": 3.0,   # equal timestamps match (right sorts first)
        "l4": None,  # key never appears on the right
    }
    # every left row survives exactly once with its own columns intact
    assert sorted(r.payload for r in got.collect()) == [
        "l0", "l1", "l2", "l3", "l4"
    ]


def test_asof_tolerance_ages_out_matches(spark):  # noqa: F811
    vals, _ = _run(spark, tolerance=3)
    assert vals == {
        "l0": None,
        "l1": 1.0,   # age 2 ≤ 3
        "l2": None,  # age 5 > 3 → aged out
        "l3": 3.0,   # age 0
        "l4": None,
    }


def _canon(df, key_cols):
    return sorted(
        (tuple(r) for r in df.select(*key_cols).collect()), key=repr
    )


def test_cogrouped_asof_matches_relational(spark):  # noqa: F811
    """The Arrow-cogrouped twin must be row-identical to the relational
    union+window composition on a dense mixed fixture (ties, missing
    partners, tolerance cutoffs, right-only keys)."""
    from yelp_recommender_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
    )

    left = spark.createDataFrame(
        [(k, t * 10 + k, float(t)) for k in range(4) for t in range(25)],
        "k int, ts long, lv double",
    )
    right = spark.createDataFrame(
        [
            (k, t * 37 % 240 + k, float(t * 100))
            for k in range(5)  # key 4 is right-only
            for t in range(13)
        ],
        "k int, ts long, rv double",
    ).groupBy("k", "ts").agg(F.max("rv").alias("rv"))

    cols = ["k", "ts", "lv", "rv_asof"]
    for tol in (None, 30):
        a = asof_join(left, right, ["k"], "ts", ["rv"], tolerance=tol)
        b = asof_join_cogrouped(
            left, right, ["k"], "ts", ["rv"], tolerance=tol
        )
        assert _canon(a, cols) == _canon(b, cols), f"tolerance={tol}"


def test_cogrouped_asof_left_only_key_gets_nulls(spark):  # noqa: F811
    from yelp_recommender_spark.operators.asof import asof_join_cogrouped

    left = spark.createDataFrame([(1, 5, 2.0)], "k int, ts long, lv double")
    right = spark.createDataFrame([(2, 1, 9.0)], "k int, ts long, rv double")
    rows = asof_join_cogrouped(
        left, right, ["k"], "ts", ["rv"]
    ).collect()
    assert len(rows) == 1 and rows[0].rv_asof is None


def test_cogrouped_asof_null_timestamps_match_relational(spark):  # noqa: F811
    """merge_asof rejects null keys; the cogrouped twin must instead
    mirror the relational contract — null-ts left rows emit with a null
    match, null-ts right rows match nothing (review fix)."""
    from yelp_recommender_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
    )

    left = spark.createDataFrame(
        [(1, 5, 2.0), (1, None, 3.0), (2, None, 4.0)],
        "k int, ts long, lv double",
    )
    right = spark.createDataFrame(
        [(1, 1, 9.0), (1, None, 8.0)], "k int, ts long, rv double"
    )
    cols = ["k", "ts", "lv", "rv_asof"]
    a = _canon(asof_join(left, right, ["k"], "ts", ["rv"]), cols)
    b = _canon(
        asof_join_cogrouped(left, right, ["k"], "ts", ["rv"]), cols
    )
    assert a == b
    assert len(b) == 3  # every left row present
