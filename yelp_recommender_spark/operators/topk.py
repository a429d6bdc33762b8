"""Top-K operators (SURVEY.md §2.5 W1-W2, §2.6).

The reference sorts + takes on the driver (global top-K TF-IDF at
``/root/reference/models/content_based_model.py:172-176``) and sorts
per-key neighbor lists inside Python lambdas
(``/root/reference/models/item_cf_model.py:309-313``). Both become
window/limit plans here.

Scale notes:
- global top-K uses ``orderBy(...).limit(k)`` — Spark plans this as
  TakeOrderedAndProject: each partition keeps only its local top-k and
  the driver merges k·numPartitions rows, never a full sort.
- per-key top-N uses ``row_number`` over a window — a single shuffle on
  the key; skewed keys are handled by AQE. Deterministic tie-breaks are
  mandatory (driver-collection order is not reproducible; SURVEY §7 risk
  register).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(
    df: DataFrame, order_col: str, k: int, tiebreak: str | None = None
) -> DataFrame:
    """Global top-k by ``order_col`` desc with a deterministic tie-break."""
    order = [F.desc(order_col)]
    if tiebreak:
        order.append(F.asc(tiebreak))
    return df.orderBy(*order).limit(k)


def top_n_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | Column,
    n: int,
    tiebreak: str | None = None,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Per-key top-N via ``row_number() over (partition by key order by
    value desc[, tiebreak asc])`` (W2)."""
    order_expr = F.desc(order_col) if isinstance(order_col, str) else order_col.desc()
    order = [order_expr]
    if tiebreak:
        order.append(F.asc(tiebreak))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)
    return out if keep_rank else out.drop(rank_col)
