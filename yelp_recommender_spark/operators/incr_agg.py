"""Incremental aggregate maintenance (materialized-view delta merge).

A 100-TB engine cannot rescan the fact table to refresh a per-key
aggregate after every ingest batch. For distributive aggregates
(COUNT/SUM — and anything derivable from them: AVG, ratio-of-sums), the
aggregate state is mergeable: a signed delta feed (+1 inserted fact row,
−1 deleted fact row) collapses to per-key deltas, and one keyed
full-outer merge updates the materialized table. Cost per refresh:
O(|delta| + |affected keys|), never O(|facts|).

The same shape underlies streaming update-mode aggregation and
incremental view maintenance in warehouse engines; here it is plain
DataFrame algebra over a relational state table, so the "view" is just a
parquet table the caller re-writes (pair with
``overwrite_partitions_dynamic`` to touch only changed partitions).

The NON-distributive tail — distinct counts, item frequencies,
quantiles — cannot be maintained this way at any cost; those are
covered by the mergeable sketch state in ``operators/sketch.py``
(HLL / count-min / KMV bottom-k / log-histogram), which trades a
bounded, documented error for the same O(|delta|) refresh.

Exactness: sums are maintained as DECIMAL end-to-end — incremental
maintenance with float sums would drift from a from-scratch recompute;
decimal state makes "maintained" and "recomputed" bit-identical, which is
exactly what the q105 oracle checks. NULL measures are exact too
(ADVICE r4): the state carries a per-measure non-null count ``nn_<c>``,
so a surviving key whose remaining measure values are all NULL yields
``sum_<c> = NULL`` — the same answer ``SUM(...)`` gives on a from-scratch
recompute — instead of a silent 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(27,6)"


def agg_state(
    facts: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Materialize the aggregate state table: per-key row count ``n`` plus,
    per requested column, the DECIMAL ``sum_<c>`` and its non-null count
    ``nn_<c>`` (the bookkeeping that lets maintenance reproduce SQL SUM's
    all-NULL → NULL answer exactly)."""
    return facts.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count(F.col(c)).alias(f"nn_{c}") for c in sum_cols],
        *[
            F.sum(F.col(c).cast(_DEC)).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def merge_deltas(
    state: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    sign_col: str = "sign",
) -> DataFrame:
    """Next aggregate state after applying a signed fact-row delta feed.

    ``deltas`` carries the key columns, the measure columns, and
    ``sign_col`` (+1 for an inserted fact row, −1 for a deleted one).
    Groups whose maintained count reaches zero disappear, and a group
    whose surviving measure values are all NULL carries ``sum_<c> = NULL``
    (via the ``nn_<c>`` non-null counts) — identical to a recompute over
    the updated fact set on ALL inputs, NULL-bearing measures included.
    Output schema equals :func:`agg_state`'s, so merges compose.

    Scale: the delta feed collapses map-side (groupBy on the same keys as
    the state table), then a single keyed full-outer join merges it; if
    the state table is stored partitioned on the keys, successive merges
    co-locate and only partitions with deltas need rewriting.
    """
    sgn = F.col(sign_col).cast("long")
    d = deltas.groupBy(*keys).agg(
        F.sum(sgn).alias("_dn"),
        *[
            F.sum(F.when(F.col(c).isNotNull(), sgn)).alias(f"_dnn_{c}")
            for c in sum_cols
        ],
        *[
            F.sum(F.col(c).cast(_DEC) * sgn).alias(f"_d_{c}")
            for c in sum_cols
        ],
    )
    zero = F.lit(0).cast(_DEC)
    merged = state.join(d, on=list(keys), how="full_outer")
    n_new = F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(
        F.col("_dn"), F.lit(0)
    )

    def _nn_new(c: str):
        return F.coalesce(F.col(f"nn_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"_dnn_{c}"), F.lit(0)
        )

    return merged.select(
        *keys,
        n_new.alias("n"),
        *[_nn_new(c).alias(f"nn_{c}") for c in sum_cols],
        *[
            # SQL SUM semantics: no non-null contributors → NULL, not 0
            F.when(
                _nn_new(c) > 0,
                F.coalesce(F.col(f"sum_{c}"), zero)
                + F.coalesce(F.col(f"_d_{c}"), zero),
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    ).filter(F.col("n") > 0)
