"""As-of (backward) join — an operator Spark's DataFrame API lacks
(pandas has ``merge_asof``; DuckDB has native ``ASOF JOIN``, which is
exactly what the oracle uses to verify this implementation).

The naive formulation — a range join ``l.ts >= r.ts`` + max-per-left —
explodes into |left|·|right| per key before pruning (Spark plans it as
a broadcast-nested-loop or cartesian per key). The scalable composition
instead UNIONS both sides, sorts each key's timeline once, and carries
the latest right-side values forward with ``last(..., ignorenulls)``
over a running window:

    union → one shuffle on the key → per-key sort → linear scan.

Cost is O((|L|+|R|) log) per key with ONE exchange — the same plan a
purpose-built as-of operator would produce, expressed in stock
DataFrame algebra (Catalyst handles the window sort; AQE handles key
skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    tolerance: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, append each ``value_cols`` column of the
    LATEST right row with ``right.ts <= left.ts`` in the same key group
    (backward as-of; ties at equal timestamps match — the right row
    sorts before the left row it stamps).

    ``tolerance`` (same unit as ``ts_col``) bounds the match age:
    matches older than ``left.ts − tolerance`` are nulled, mirroring
    ``pandas.merge_asof(tolerance=...)``.

    Requirement: ``right`` must be unique per (keys, ts) — pre-aggregate
    duplicates first (e.g. ``groupBy(keys, ts).agg(max(v))``); with
    duplicates the carried value is tie-order dependent.

    Output: every left column, plus ``f"{c}{suffix}"`` per value column
    (null when no right row qualifies)."""
    lcols = left.columns
    marked = [f"_av_{c}" for c in value_cols]

    l2 = left.withColumn("_side", F.lit(1)).withColumn(
        "_av__ts", F.lit(None).cast(right.schema[ts_col].dataType)
    )
    for c, m in zip(value_cols, marked):
        l2 = l2.withColumn(m, F.lit(None).cast(right.schema[c].dataType))

    r2 = right.select(
        *keys,
        F.col(ts_col),
        F.col(ts_col).alias("_av__ts"),
        *[F.col(c).alias(m) for c, m in zip(value_cols, marked)],
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in (*keys, ts_col):
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry-forward columns MUST be materialized before the side filter:
    # a window computed after it would only see left rows
    u = u.withColumn("_m_ts", F.last("_av__ts", ignorenulls=True).over(w))
    carried = [f"_carry_{c}" for c in value_cols]
    for m, cc in zip(marked, carried):
        u = u.withColumn(cc, F.last(m, ignorenulls=True).over(w))
    within = (
        F.lit(True)
        if tolerance is None
        else F.col(ts_col) - F.col("_m_ts") <= F.lit(tolerance)
    )
    out_vals = [
        F.when(F.col("_m_ts").isNotNull() & within, F.col(cc))
        .alias(f"{c}{suffix}")
        for c, cc in zip(value_cols, carried)
    ]
    return u.filter(F.col("_side") == 1).select(*lcols, *out_vals)


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    tolerance: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Same contract as :func:`asof_join`, implemented as a COGROUPED
    Arrow map: ``left.groupBy(keys).cogroup(right.groupBy(keys))``
    aligns both sides' rows for a key in one pandas call, where
    ``pandas.merge_asof`` runs the backward scan in C.

    Exists as the cross-check twin (pytest pins it row-identical to the
    relational composition on the same inputs) and as the template for
    per-key logic that genuinely needs both sides materialized —
    irregular resampling, per-key model scoring, custom alignment rules
    — where the union-window trick no longer applies.

    Scale trade vs :func:`asof_join`: same single co-partitioning
    shuffle, but each key's FULL left+right row sets materialize in
    worker memory as pandas frames (the relational form streams through
    a window), and rows cross the JVM↔Arrow boundary twice. Prefer the
    relational form when the semantics fit it; measure before choosing
    this one for hot paths.
    """
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = list(left.schema.fields) + [
        T.StructField(f"{c}{suffix}", right.schema[c].dataType)
        for c in value_cols
    ]
    schema = T.StructType(out_fields)

    def align(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in out_fields]
        if lpdf.empty:
            return pd.DataFrame(columns=cols)
        out_names = [f"{c}{suffix}" for c in value_cols]
        # merge_asof rejects null keys outright; the relational form
        # simply matches nothing for them — split them off, stamp null
        # outputs, and fold them back (same for null right timestamps:
        # they can never be a backward match)
        l_null = lpdf[lpdf[ts_col].isna()].copy()
        lp = lpdf[lpdf[ts_col].notna()].sort_values(
            ts_col, kind="mergesort"
        )
        for n in out_names:
            l_null[n] = None
        rp = rpdf[rpdf[ts_col].notna()] if not rpdf.empty else rpdf
        if lp.empty or rp.empty:
            res = lp.copy()
            for n in out_names:
                res[n] = None
        else:
            rp = (
                rp[[ts_col, *value_cols]]
                .rename(columns=dict(zip(value_cols, out_names)))
                .sort_values(ts_col, kind="mergesort")
            )
            res = pd.merge_asof(
                lp,
                rp,
                on=ts_col,
                direction="backward",
                tolerance=tolerance,
                suffixes=("", "_r"),
            )
        if not l_null.empty:
            res = pd.concat([res[cols], l_null[cols]], ignore_index=True)
        return res[cols]

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(align, schema)
    )
