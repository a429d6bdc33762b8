"""Range join (point-in-interval) — the second relational operator the
brief names that Spark lacks a scalable primitive for: expressing
``start <= pt AND pt <= end`` directly plans a BroadcastNestedLoopJoin
(or per-key cartesian), O(|points|·|intervals|) per key.

The standard fix is bucketization: quantize the domain into fixed-width
buckets, explode each interval to the buckets it covers, land each point
in its single bucket, equi-join on (keys, bucket), then apply the exact
between-filter. Join work becomes O(|points| + Σ interval_len/width)
with ONE hash-partitioned equi-join — and because a point occupies
exactly one bucket, each qualifying (point, interval) pair is emitted
exactly once: no dedup pass.

``bucket_width`` trades explode factor (long intervals → many buckets)
against join selectivity (wide buckets → more post-filtered pairs);
size it near the median interval length — or omit it and let
:func:`auto_bucket_width` derive exactly that from the data (one cheap
aggregate), with the per-interval explode factor capped so a few
whole-history outlier spans can't blow the exploded row count up.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def auto_bucket_width(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    max_explode: int = 64,
) -> int:
    """Derive a bucket width from the interval-length distribution: the
    MEDIAN length (the docstring's sizing rule), raised when necessary so
    the LONGEST interval explodes to at most ``max_explode`` buckets.

    One single-pass aggregate (approx_percentile sketch + max) over the
    interval side only — at 100× the time range the width grows with the
    spans, keeping the exploded row count bounded instead of linear in
    span length (VERDICT r4). When the cap binds (heavily skewed lengths:
    median ≪ max) a warning records the trade — wider buckets mean more
    post-filtered candidate pairs, the audit-don't-silently-degrade rule
    q35 uses."""
    length = (F.col(end_col) - F.col(start_col)).cast("double")
    row = intervals.select(
        F.expr(
            f"approx_percentile({end_col} - {start_col}, 0.5)"
        ).alias("med"),
        F.max(length).alias("mx"),
    ).head()
    if row is None or row["med"] is None:
        return 1  # empty interval side: any width joins nothing
    median_len = max(1, int(row["med"]))
    cap_width = int(float(row["mx"]) / max_explode) + 1
    if cap_width > median_len:
        logger.warning(
            "auto_bucket_width: interval lengths are skewed (median %d, "
            "max %.0f) — widening buckets %d -> %d so the longest "
            "interval explodes to <= %d buckets (more post-filter "
            "candidates in exchange)",
            median_len, float(row["mx"]), median_len, cap_width, max_explode,
        )
    return max(median_len, cap_width)


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    pt_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Inner join of each point to every interval (same ``keys``) with
    ``start <= pt <= end``. Output: all point columns + all interval
    columns (minus the duplicated keys). Intervals with end < start are
    dropped (empty by definition). ``bucket_width=None`` derives the
    width from the interval-length stats (:func:`auto_bucket_width`)."""
    if bucket_width is None:
        bucket_width = auto_bucket_width(intervals, start_col, end_col)
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    p = points.withColumn(
        "_bkt", F.floor(F.col(pt_col) / F.lit(bucket_width))
    )
    iv = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor(F.col(end_col) / F.lit(bucket_width)),
            )
        ),
    )
    joined = p.join(iv, [*keys, "_bkt"]).filter(
        (F.col(start_col) <= F.col(pt_col))
        & (F.col(pt_col) <= F.col(end_col))
    )
    return joined.drop("_bkt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair sharing
    ``keys`` with ``l_start <= r_end AND r_start <= l_end`` (closed
    intervals), emitted exactly once. ``bucket_width=None`` derives the
    width from BOTH sides' interval-length stats (both explode here, so
    the sizing pool is their union).

    Unlike the point case, BOTH sides explode to their covered buckets,
    so an overlapping pair meets in every bucket their spans share; the
    pair is kept only in the bucket containing ``greatest(l_start,
    r_start)`` — the first shared bucket, which every overlapping pair
    has exactly one of. That makes emission exactly-once WITHOUT a
    distinct/dedup shuffle over the (potentially huge) pair stream.

    Scale: one hash equi-join on (keys, bucket); work is
    Σ span/width per side plus true-pair post-filtering. Skewed buckets
    (one hot time range) respond to AQE skew splitting since the join is
    a plain equi-join.
    """
    if bucket_width is None:
        lengths = left.select(
            (F.col(l_end) - F.col(l_start)).alias("_len")
        ).unionByName(
            right.select((F.col(r_end) - F.col(r_start)).alias("_len"))
        )
        bucket_width = auto_bucket_width(
            lengths.withColumn("_zero", F.lit(0)), "_zero", "_len"
        )
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    def burst(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(F.col(s) <= F.col(e)).withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / F.lit(bucket_width)),
                    F.floor(F.col(e) / F.lit(bucket_width)),
                )
            ),
        )

    joined = burst(left, l_start, l_end).join(
        burst(right, r_start, r_end), [*keys, "_bkt"]
    )
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    first_shared = F.col("_bkt") == F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / F.lit(bucket_width)
    )
    return joined.filter(overlap & first_shared).drop("_bkt")
