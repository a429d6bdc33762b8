"""Snapshot diff (operators/diff.py) and SCD2 merge (operators/scd.py):
NULL-safe change detection, key-only membership changes, and multi-batch
history chaining."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


def test_snapshot_diff_classifies_and_is_null_safe(spark):  # noqa: F811
    from yelp_recommender_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d"), (5, "e")],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (5, None), (6, "f")],
        "k long, v string",
    )
    got = {
        r.k: (r.change, r.old_v, r.new_v)
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("changed", "b", "B"),
        4: ("removed", "d", None),
        5: ("changed", "e", None),  # value→NULL is a change
        6: ("added", None, "f"),
    }
    # 1 (identical) and 3 (NULL→NULL) are absent: not changes


def test_snapshot_diff_composite_key(spark):  # noqa: F811
    from yelp_recommender_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, "x", 10.0)], "a long, b string, v double")
    new = spark.createDataFrame([(1, "x", 11.0)], "a long, b string, v double")
    rows = snapshot_diff(old, new, ["a", "b"]).collect()
    assert len(rows) == 1
    assert (rows[0].a, rows[0].b, rows[0].change) == (1, "x", "changed")


def test_scd2_merge_chains_batches(spark):  # noqa: F811
    from yelp_recommender_spark.operators.scd import scd2_merge

    dim = spark.createDataFrame(
        [(1, "gold", 0, None), (2, "silver", 0, None)],
        "k long, tier string, valid_from long, valid_to long",
    )
    # batch 1: key 1 changes tier; key 3 appears
    b1 = spark.createDataFrame(
        [(1, "platinum"), (2, "silver"), (3, "bronze")], "k long, tier string"
    )
    h1 = scd2_merge(dim, b1, ["k"], ["tier"], batch_ts=100)
    # batch 2: key 3 changes; key 1 unchanged
    b2 = spark.createDataFrame([(1, "platinum"), (3, "iron")], "k long, tier string")
    h2 = scd2_merge(h1, b2, ["k"], ["tier"], batch_ts=200)

    rows = {
        (r.k, r.tier, r.valid_from, r.valid_to) for r in h2.collect()
    }
    assert rows == {
        (1, "gold", 0, 100),        # closed by batch 1
        (1, "platinum", 100, None),  # current, survived batch 2 unchanged
        (2, "silver", 0, None),      # never touched
        (3, "bronze", 100, 200),     # opened by b1, closed by b2
        (3, "iron", 200, None),      # current
    }
    # invariant: exactly one current row per live key
    cur = h2.filter(F.col("valid_to").isNull()).groupBy("k").count()
    assert all(r["count"] == 1 for r in cur.collect())


def test_scd2_merge_is_one_join_one_pass(spark):  # noqa: F811
    """r9 plan pin: the merge consumes the current-vs-updates join ONCE
    (explode-the-fates), never once per branch — the pre-r9 three-branch
    filter+union recomputed the join and the current-rows scan per
    branch because per-branch predicate pushdown defeats exchange reuse.
    Pinned on a parquet-backed dim so the scan count is the real thing."""
    import os

    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.scd import scd2_merge

    dim_path = str(spark._sc._temp_dir) + "/scd_pin_dim.parquet"
    spark.range(2_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("attr"),
        F.lit(0).cast("long").alias("valid_from"),
        F.when(F.col("id") % 5 == 0, F.lit(1)).cast("long").alias("valid_to"),
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    updates = spark.range(500).select(
        (F.col("id") * 3).alias("k"), F.lit(99.0).alias("attr")
    )
    out = scd2_merge(dim, updates, ["k"], ["attr"], batch_ts=7)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # dim feeds: history passthrough, the current-rows join, the
    # brand-new anti-join's key side — three reads by design, never
    # one per output branch (pre-fix this counted 5+)
    assert plan.count("Scan parquet") <= 4, plan.count("Scan parquet")
    # row fates all present: history kept, changed keys closed+reopened
    assert out.filter(F.col("valid_to") == 1).count() == 400  # history
    closed = out.filter(F.col("valid_to") == 7)
    reopened = out.filter(
        (F.col("valid_from") == 7) & F.col("valid_to").isNull()
    )
    assert closed.count() > 0 and reopened.count() >= closed.count()
