"""Slowly-changing-dimension type-2 merge — apply a batch of dimension
updates to a versioned history table: changed attributes close the
current row (``valid_to`` = batch timestamp) and open a new one; new
keys open their first row; untouched keys and already-closed history
pass through. The warehouse MERGE pattern expressed as pure DataFrame
set algebra (no MERGE INTO / table-format dependency — the output is
the next history snapshot, written wholesale or via
``overwrite_partitions_dynamic``).

No reference counterpart (the reference has no versioned state at all);
beyond-reference warehouse surface, fully oracle-checkable (q91).

Scale: one shuffle join of CURRENT rows (a fraction of history) against
the update batch, one anti-join for brand-new keys; closed history is
touched by nothing (union-passthrough — at 100 TB that is the point:
the merge cost is O(current + batch), not O(history)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_merge"]


def _differs(attr_cols: list[str], left_prefix: str, right_prefix: str) -> Column:
    d = F.lit(False)
    for c in attr_cols:
        d = d | ~F.col(f"{left_prefix}{c}").eqNullSafe(
            F.col(f"{right_prefix}{c}")
        )
    return d


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    batch_ts: int,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Next SCD2 history snapshot. ``dim`` columns: keys + attrs +
    ``valid_from`` (long) + ``valid_to`` (long, NULL = current row).
    ``updates``: keys + attrs, one row per key (the batch's latest
    state). ``batch_ts`` stamps every closure and opening.

    Row fates:
    - closed history rows (``valid_to`` not NULL): pass through;
    - current rows without an update, or whose update matches all
      ``attr_cols`` (NULL-safe): pass through;
    - current rows whose update differs: emitted CLOSED
      (``valid_to = batch_ts``) plus a new OPEN row with the update's
      attributes (``valid_from = batch_ts``);
    - update keys absent from ``dim``: a first OPEN row.

    Edge: an update whose key exists in ``dim`` but has NO current row
    (all rows closed — possible only if an upstream process closes rows
    without reopening, e.g. logical deletes) is dropped: it is neither
    brand-new nor joinable to a current row. Re-activation semantics
    would need an explicit delete marker in the feed; out of scope here."""
    from yelp_recommender_spark.cache import register_persist

    hist = dim.filter(F.col(valid_to).isNotNull())
    cur = dim.filter(F.col(valid_to).isNull())

    # the batch is consumed twice (the current-row join and the
    # brand-new anti-join) and is batch-sized BY CONTRACT — pin it so
    # its feed derivation runs once (released at the pipeline boundary
    # by clear_caches; dim is deliberately NOT pinned — it is the
    # O(history) side this merge promises never to materialize)
    updates = register_persist(updates)

    # join-presence marker column (attr nullability can't signal a match
    # — a legitimate NULL attribute would read as "no update")
    upd = updates.select(
        *key_cols, *[F.col(c).alias(f"_u_{c}") for c in attr_cols]
    ).withColumn("_has_upd", F.lit(True))
    j = cur.join(upd, key_cols, "left")
    changed = F.coalesce(F.col("_has_upd"), F.lit(False)) & _differs(
        attr_cols, "_u_", ""
    )

    # every current row's fate in ONE pass over the join: unchanged →
    # itself, changed → [closed twin, reopened twin]. The former
    # three-branch filter+union formulation consumed the join three
    # times — and because Catalyst pushes each branch's predicate
    # fragments below it, the exchanges stop being identical, exchange
    # reuse never fires (verified post-execution: 0 ReusedExchange) and
    # the current-rows scan + join recompute once per branch. The
    # explode keeps the merge one join + one map pass — O(current +
    # batch) in the PLAN, not just asymptotically
    def _fate(overrides: dict) -> Column:
        return F.struct(
            *[overrides.get(c, F.col(c)).alias(c) for c in dim.columns]
        )

    closed_row = _fate({valid_to: F.lit(batch_ts).cast("long")})
    reopened_row = _fate(
        {
            **{c: F.col(f"_u_{c}") for c in attr_cols},
            valid_from: F.lit(batch_ts).cast("long"),
            valid_to: F.lit(None).cast("long"),
        }
    )
    merged_cur = j.select(
        F.explode(
            F.when(changed, F.array(closed_row, reopened_row)).otherwise(
                F.array(_fate({}))
            )
        ).alias("_r")
    ).select("_r.*")
    brand_new = (
        updates.join(dim.select(*key_cols).distinct(), key_cols, "left_anti")
        .select(
            *key_cols,
            *attr_cols,
            F.lit(batch_ts).cast("long").alias(valid_from),
            F.lit(None).cast("long").alias(valid_to),
        )
        .select(*dim.columns)
    )
    return hist.unionByName(merged_cur).unionByName(brand_new)
