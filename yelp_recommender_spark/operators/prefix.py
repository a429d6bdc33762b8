"""Distributed prefix sum (running total over a GLOBAL order).

The naive Spark form — ``SUM(v) OVER (ORDER BY k)`` with no PARTITION BY —
plans a single-partition window: every row flows through one task, which
is exactly the thing that cannot run at 100 TB. This module implements the
textbook two-stage scan instead:

1. bucket every row by approximate percentiles of the order column (one
   sketch-aggregate pass producing ≤ ``n_buckets`` boundary values,
   carried in-plan via a broadcast — no driver collect);
2. per-bucket running totals with ``Window.partitionBy(bucket)`` — all
   buckets scan in parallel;
3. per-bucket totals (tiny: one row per bucket) get their own cumulative
   offsets with a window over ``n_buckets`` rows, broadcast-joined back.

Wall-clock is two parallel passes plus an O(n_buckets) reduction; nothing
sequential ever sees more than ~1 bucket of the data. The reference has
no counterpart (driver-side loops would play this role); the shape is the
standard parallel-scan decomposition (Blelloch-style upsweep/downsweep
restated as DataFrame algebra).

Boundary choice is deliberately ``approx_percentile``: the exact
``percentile`` aggregate buffers every distinct order value in one
aggregation buffer — with a globally-unique order column that is the
whole dataset in one JVM, quietly re-introducing the bottleneck the
operator exists to remove. The sketch is bounded-memory, and boundary
placement only steers LOAD BALANCE, never the answer: a row's final
prefix is local_run + offset of whatever bucket it lands in, identical
for any bucket assignment. The OUTPUT is therefore exactly as
deterministic as the input; only stage task sizes may vary.

The bucketed intermediate is persisted through the session cache registry
(two consumers — the per-bucket window and the bucket-totals aggregate —
would otherwise each recompute the scan + sketch + bucket assignment);
``clear_caches`` releases it at the owning pipeline's boundary.

Requires ``order_col`` to be globally unique (ties would make "the running
total at this row" ill-defined; both engines' RANGE window frames would
still agree, but packing semantics downstream want a strict order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _order_surrogate(df: DataFrame, order_col: str) -> Column:
    """A numeric expression MONOTONE in ``order_col``'s ordering, for
    the percentile sketch + bucket assignment. Monotonicity (not
    injectivity) is the correctness requirement: buckets must be
    order-contiguous so per-bucket offsets compose; ties inside the
    surrogate merely share a bucket (load balance, never the answer —
    within-bucket order is the real column). Numerics cast directly;
    strings pack their first three code points into 21-bit lanes
    (2²¹ > max Unicode code point, and Spark compares strings by code
    point), so string-keyed corpora — a legal doc_id type everywhere in
    the engine — never hit an ANSI cast error here (found by the r8
    string-keyed ingest test)."""
    if isinstance(df.schema[order_col].dataType, T.StringType):
        return sum(
            (
                F.coalesce(
                    F.ascii(F.substring(F.col(order_col), i + 1, 1)),
                    F.lit(0),
                ).cast("double")
                * float(2 ** (42 - 21 * i))
                for i in range(3)
            ),
            F.lit(0.0),
        )
    return F.col(order_col).cast("double")


def with_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_sum",
    n_buckets: int | None = None,
) -> DataFrame:
    """``df`` plus ``out_col`` = inclusive running sum of ``value_col``
    over the global ``order_col`` order, computed without any
    single-partition stage over the data."""
    if n_buckets is None:
        n_buckets = df.sparkSession.sparkContext.defaultParallelism
    n_buckets = max(int(n_buckets), 1)

    if n_buckets == 1:
        w = Window.orderBy(order_col)
        return df.withColumn(out_col, F.sum(value_col).over(w))

    from yelp_recommender_spark.cache import register_persist

    qs = [i / n_buckets for i in range(1, n_buckets)]
    surrogate = _order_surrogate(df, order_col)
    boundaries = df.agg(
        F.percentile_approx(
            surrogate,
            F.array(*[F.lit(q) for q in qs]),
            10_000,
        ).alias("_bounds")
    )
    # bucket = number of boundaries at or below this row's order value —
    # a per-row array reduction over ≤ n_buckets-1 broadcast values
    bucketed = register_persist(
        df.crossJoin(F.broadcast(boundaries))
        .withColumn("_surr", surrogate)
        .withColumn(
            "_bucket",
            F.aggregate(
                "_bounds",
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col("_surr") >= b, 1).otherwise(0),
            ),
        )
        .drop("_surr")
    )

    local_w = Window.partitionBy("_bucket").orderBy(order_col)
    local = bucketed.withColumn("_local_run", F.sum(value_col).over(local_w))

    # per-bucket totals: n_buckets rows — the single-partition window here
    # is over a BOUNDED input (one row per bucket), not the data
    totals = (
        bucketed.groupBy("_bucket")
        .agg(F.sum(value_col).alias("_bucket_total"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_bucket_total").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bucket", "_offset")
    )

    return (
        local.join(F.broadcast(totals), "_bucket")
        .withColumn(out_col, F.col("_local_run") + F.col("_offset"))
        .drop("_bucket", "_bounds", "_local_run", "_offset")
    )
