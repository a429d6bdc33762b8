"""Snapshot reconciliation — diff two versions of a table into
added / removed / changed rows (the data-engineering "table diff" that
backs CDC backfills, regression checks between pipeline versions, and
incremental-materialization validation).

The reference has no notion of table versions; this is beyond-reference
warehouse surface, and it carries the engine's one FULL OUTER join
(every other catalog join is inner/left/semi/anti — the reconciliation
shape genuinely needs both unmatched sides).

Scale: one full-outer shuffle join on the key columns (both sides hash-
partition once); the change classification and value comparison are
row-local column algebra, and unchanged rows — the overwhelming
majority in any real diff — are filtered before anything downstream,
so the output is proportional to the CHANGE volume, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., change, old_<c>, new_<c>...) for every key that was
    added (only in ``new``), removed (only in ``old``) or changed (in
    both, any compared column differs — NULL-safe: NULL→value and
    value→NULL count as changes, NULL→NULL does not). Unchanged keys
    are dropped.

    ``compare_cols`` defaults to every non-key column shared by both
    sides. Keys must be unique per side (it is a snapshot diff, not a
    bag diff)."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"_ok_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_nk_{key_cols[0]}").isNotNull()
    differs = F.lit(False)
    for c in compare_cols:
        # NULL-safe inequality: eqNullSafe is true for NULL==NULL
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.filter(~in_old | ~in_new | differs)
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in key_cols
            ],
            change.alias("change"),
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
