"""Exponentially-weighted moving average per key — the grouped-map
(`applyInPandas`) showcase, used where the computation is a genuine
RECURRENCE: y_t = (1−α)·y_{t−1} + α·x_t with y_0 = x_0.

A bounded SQL window cannot express this — the closed form
Σ α(1−α)^(t−i)·x_i needs (1−α)^t factors that underflow to 0 for long
series (a few thousand steps at α=0.2), and rescaling tricks overflow
instead. The engine-wide no-row-UDF policy still holds: the recurrence
runs as ONE Arrow-batched grouped-map per key over pandas' C-implemented
``ewm`` kernel, not a per-row Python call.

Scale: ``groupBy(keys).applyInPandas`` shuffles each key's rows to one
worker — correct for series that fit a worker (the recurrence is
inherently sequential per key; parallelism comes from the number of
keys). For the intended use (smoothing PRE-AGGREGATED per-key series —
daily metrics, not raw facts) a series is thousands of rows, far below
any memory bound; smoothing raw event streams should aggregate to the
series grain first (cf. q97's window-over-aggregate note).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ewma_by_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out: str = "ewma",
) -> DataFrame:
    """``df`` plus an ``out`` column: the EWMA of ``value_col`` within
    each key group, ordered by ``order_col`` (which must be unique per
    key for a deterministic series)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.DoubleType())]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf[out] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    return df.groupBy(*keys).applyInPandas(smooth, schema)
