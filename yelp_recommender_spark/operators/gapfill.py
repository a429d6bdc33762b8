"""Time-series gap fill + forward fill (hypertable ``time_bucket_gapfill``
/ ``locf`` shape).

Regular-grid consumers (forecasting features, dashboards, window models)
need every (key, slot) present even when no event landed in the slot.
The operator materializes each key's calendar between its first and last
observed slot with ``sequence()`` + ``explode`` (a row-local generator —
no driver loop, no cross join against a global calendar table), left-joins
the observed aggregate back, and carries values forward with
``last(ignorenulls)`` over an unbounded-preceding row frame.

Scale: the calendar explode emits span/step rows per key — proportional
to the OUTPUT, which is the floor for any gap-fill. The join is keyed on
(keys, slot) and the fill window partitions on the same keys, so the
join's shuffle partitioning is reused by the window; per-key state in the
fill is one value (the last seen), never a buffered array. Dense keys
cost nothing extra; a key observed once emits one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_ffill(
    observed: DataFrame,
    keys: list[str],
    slot_col: str,
    step: int,
    fill_cols: list[str],
    count_col: str | None = None,
) -> DataFrame:
    """Fill missing ``slot_col`` values (integer grid, spacing ``step``)
    per key between each key's min and max slot; forward-fill each of
    ``fill_cols`` (suffix ``_ff``); if ``count_col`` is given, missing
    slots get 0 instead of NULL there.

    ``observed`` must be pre-aggregated to one row per (keys, slot).
    """
    bounds = observed.groupBy(*keys).agg(
        F.min(slot_col).alias("_t0"), F.max(slot_col).alias("_t1")
    )
    calendar = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("_t0"), F.col("_t1"), F.lit(step))
        ).alias(slot_col),
    )
    joined = calendar.join(observed, [*keys, slot_col], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(slot_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = [*keys, slot_col]
    if count_col is not None:
        out_cols.append(
            F.coalesce(F.col(count_col), F.lit(0)).alias(count_col)
        )
    out_cols.extend(
        F.last(c, ignorenulls=True).over(w).alias(f"{c}_ff")
        for c in fill_cols
    )
    return joined.select(*out_cols)
