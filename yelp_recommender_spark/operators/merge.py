"""Keyed CDC apply — the snapshot-maintenance complement to SCD2.

:func:`~yelp_recommender_spark.operators.scd.scd2_merge` keeps *history*
(validity intervals); ``apply_cdc`` keeps the *latest snapshot*: given a
base table and a change feed of upserts/deletes with a monotone sequence
column, it produces the table state after applying the latest change per
key — the semantics of ``MERGE INTO`` with ``WHEN MATCHED UPDATE/DELETE``
and ``WHEN NOT MATCHED INSERT``, expressed as pure DataFrame algebra so it
needs no table format with merge support.

Scale: one window pass over the change feed (partitioned by key — a batch
of changes, not the full table) collapses it to ≤ one row per key; the
apply is then a single key-equi full-outer join of snapshot × collapsed
feed, O(|base| + |changes|). No per-key loops, no driver state. At 100 TB
the snapshot side stays partitioned on the key across daily applies, so
successive runs co-locate; pair with
:func:`~yelp_recommender_spark.sources.writers.overwrite_partitions_dynamic`
to rewrite only partitions that received changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OP_UPSERT = "U"
OP_DELETE = "D"


def latest_changes(
    changes: DataFrame, keys: list[str], seq_col: str = "seq"
) -> DataFrame:
    """Collapse a change feed to its highest-``seq_col`` row per key.

    Ties on ``seq_col`` are broken by the op column descending ('U' > 'D')
    only if present — callers should supply unique sequence numbers per
    key; the deterministic tiebreak just prevents nondeterminism if they
    don't."""
    order = [F.col(seq_col).desc()]
    if "op" in changes.columns:
        order.append(F.col("op").desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Next snapshot of ``base`` after applying ``changes`` (latest per key).

    ``changes`` carries the key columns, ``op_col`` ('U' upsert — full
    replacement row — or 'D' delete), ``seq_col`` (monotone per key), and
    the same payload columns as ``base``. Semantics per key:

    - no change row → base row passes through;
    - latest op 'U' → the change row's payload replaces (or inserts) the
      row;
    - latest op 'D' → the row is absent from the output (deleting a key
      not in ``base`` is a no-op).
    """
    payload = [c for c in base.columns if c not in keys]
    latest = latest_changes(changes, keys, seq_col).select(
        *keys,
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_u_{c}") for c in payload],
    )
    joined = base.join(latest, on=list(keys), how="full_outer")
    alive = joined.filter(F.col("_op").isNull() | (F.col("_op") != OP_DELETE))
    return alive.select(
        *keys,
        *[
            F.when(F.col("_op") == OP_UPSERT, F.col(f"_u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )
