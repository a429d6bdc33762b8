"""Explicit skew-handling operators: deterministic salting for joins and
two-stage aggregation.

AQE's skew-join splitting (on in :mod:`yelp_recommender_spark.session`)
handles sort-merge join skew at runtime, but it cannot help when (a) the
join is shuffle-hash / broadcast-ineligible with a pathological hot key,
or (b) a single group key dominates an aggregation so one reducer owns
almost all rows. These operators spread such keys EXPLICITLY:

- :func:`salted_join` — the classic replicate-the-small-side pattern: the
  big side gets a deterministic salt in [0, n_salts), the small side is
  replicated once per salt value, and the join key becomes (key, salt) —
  a hot key's rows land on n_salts reducers instead of one.
- :func:`salted_aggregate` — two-stage aggregation: partial by
  (keys, salt), final by keys. Spark's hash aggregate already computes
  map-side partials, but a dominant key still funnels every partial into
  ONE final reducer task; the salted stage bounds any reducer's input at
  ~1/n_salts of the hot key.

Salts are DETERMINISTIC (xxhash64 of chosen columns, not ``rand()``):
task retries and speculative execution must regenerate identical salt
assignments or a shuffle retry silently duplicates/loses rows — the same
reproducibility rule the engine applies to sampling
(:mod:`yelp_recommender_spark.functions.sampling`).

The reference never needs this (driver dicts don't shuffle), but its
workloads do the moment they distribute: ratings-per-business follows a
power law (SURVEY §7 risk register), and a 100-TB events table always
has a whale user/key.

WHICH AGGREGATE SHAPES EVER NEED SKEW HANDLING — measured, not argued
(`tests/test_skew_scale.py` harness; numbers in BASELINE.md, 50%-whale
key, min-of-2 on local[32]):

1. **Decomposable aggs (sum/count/min/max/avg): never.** Map-side
   partial aggregation compresses the whale to one partial per map
   task before any shuffle; plain beat :func:`salted_aggregate` at
   every measured whale size (the r6 negative). Salting these is pure
   overhead — keep it only for the theoretical
   one-task-input-exceeds-memory cliff, which partials make all but
   unreachable for bounded-size aggregation states.
2. **Exact distinct-count: never — but only in the right spelling.**
   ``F.countDistinct`` plans as Expand + re-aggregation keyed on
   (group, value): the shuffle spreads on the VALUE, so the whale
   self-salts. Measured at 40M rows / 50% whale / all-unique values:
   2.1 s vs 1.6 s uniform (1.3×). The WRONG spelling of the same
   query, ``size(collect_set(v))``, is shape 3.
3. **High-cardinality-state object aggregates (collect_set /
   collect_list): the real agg-skew shape.** The whale's aggregation
   state itself is Ω(whale rows) on ONE task and partials cannot
   compress unique values. Measured (same fixture): uniform 1.8 s,
   50% whale **24.9 s (13.5×)** — and the penalty grows superlinearly
   with whale size (2.8× at 20M rows → 13.5× at 40M). Salting is NOT
   the durable fix: value-salting the partial stage rescued the 20M
   point (4.6 s → 2.0 s) but inverted at 40M (33.1 s — the object-agg
   shuffle itself dominates). The fix is RE-EXPRESSION: distinct-count
   shapes → ``countDistinct`` (12× faster at 40M); materialized
   collections → a bounded per-key top-k contract
   (:mod:`~yelp_recommender_spark.operators.topk`), because an
   unbounded whale collection is output-bound — Ω(whale) in the one
   result row — no matter how the plan spreads the work.
4. **Ordered windows over a whale key: real past ~10⁷ rows/key.**
   One key's window is one task's sort; measured one-key vs
   1000-key-spread twin: 1.3× at 1M rows (non-event — matches the
   planted-whale sf1 result), 3.6× at 10M, 3.0× at 50M (23.4 s on the
   single task). No salt preserves ordered-frame semantics; for
   decomposable running aggregates the fix is the engine's two-stage
   bucketed prefix sum (:func:`~yelp_recommender_spark.operators.
   prefix.with_prefix_sum`): same 50M one-key running total in 6.1 s
   (3.8× faster), identical values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LEFTISH = {
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti", "cross",
}


def with_salt(
    df: DataFrame,
    n_salts: int,
    cols: Sequence[str] | None = None,
    salt_col: str = "_salt",
) -> DataFrame:
    """``df`` plus a deterministic salt column in [0, n_salts):
    ``pmod(xxhash64(cols), n_salts)`` over ``cols`` (default: every
    column). Identical rows share a salt — harmless for joins and for
    decomposable aggregates, and the price of retry-safe determinism."""
    use = list(cols) if cols else list(df.columns)
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in use]), F.lit(n_salts)).cast(
            "int"
        ),
    )


def _whale_guard(
    df: DataFrame,
    keys: Sequence[str],
    whale_frac: float,
    whale_min_rows: int,
) -> dict:
    """The detector half of the auto loop: one bounded-state scan
    (:func:`detect_skew`), engage when some key holds both ≥
    ``whale_frac`` of the rows AND ≥ ``whale_min_rows`` rows — the
    fraction alone flags small tables whose 'whale' fits one task
    trivially; the absolute floor is the measured crossover / memory
    cliff. Returns the decision record (bounded: ≤ k whale rows)."""
    whales = detect_skew(df, list(keys), min_frac=whale_frac).collect()
    over = [r for r in whales if int(r.n_hi) >= whale_min_rows]
    return {
        "engaged": bool(over),
        "n_whales": len(whales),
        "max_frac_hi": max(
            (float(r.frac_hi) for r in whales), default=0.0
        ),
        "max_n_hi": max((int(r.n_hi) for r in whales), default=0),
        "thresholds": {
            "whale_frac": float(whale_frac),
            "whale_min_rows": int(whale_min_rows),
        },
    }


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int | str = 8,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
    whale_frac: float = 0.10,
    whale_min_rows: int = 10_000_000,
    auto_salts: int = 8,
    decision_out: dict | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: identical results to
    ``big.join(small, on, how)`` with the big side's hot keys spread over
    ``n_salts`` reducers. The small side is replicated ``n_salts``× (an
    explode over literal salts — map-only), so size it like a broadcast
    candidate that just misses the threshold.

    ``n_salts="auto"`` closes the detect→remedy loop: the Misra-Gries
    whale guard (one bounded-state scan of ``big``) decides, and the
    plan salts ONLY when a key holds ≥ ``whale_frac`` of the rows and ≥
    ``whale_min_rows`` rows (the replication tax is real — don't pay it
    for uniform keys); otherwise the join runs plain. Results are
    identical either way (the q71 salting-invisible contract);
    ``decision_out`` (caller dict, updated in place) records which path
    ran and the whale evidence. The guard costs one extra scan of
    ``big`` — pass an int when the skew profile is already known.

    Only left-preserving joins are supported (inner/left/left_semi/
    left_anti): each big row carries exactly ONE salt, so it matches or
    misses exactly as in the plain join; a right/full join would emit
    every unmatched SMALL row once per replica — n_salts duplicates."""
    if how not in _LEFTISH - {"cross"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}"
            " — right/full joins would duplicate unmatched small-side rows"
            " once per salt replica"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if n_salts == "auto":
        decision = _whale_guard(
            big, salt_cols or keys, whale_frac, whale_min_rows
        )
        decision["plan"] = "salted" if decision["engaged"] else "plain"
        if decision_out is not None:
            decision_out.update(decision)
        if not decision["engaged"]:
            return big.join(small, keys, how)
        n_salts = auto_salts
    elif not isinstance(n_salts, int):
        raise ValueError(f"n_salts must be an int or 'auto', got {n_salts!r}")
    salted_big = with_salt(big, n_salts, cols=salt_cols or keys)
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated, keys + ["_salt"], how).drop("_salt")


# final-stage merge per partial-aggregate function
_DECOMP = {"sum", "count", "min", "max", "dsum", "avg"}


def _plain_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """One-stage ``groupBy(keys).agg(...)`` from the same spec language
    as :func:`salted_aggregate` — the plan the auto guard picks when no
    whale justifies the two-stage shuffle. Value-identical to the
    salted plan: ``dsum``/``avg`` go through the same exact-decimal
    sums, so plan choice cannot perturb the result."""
    cols: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn not in _DECOMP:
            raise ValueError(f"unsupported salted aggregate fn {fn!r}")
        if fn == "sum":
            cols.append(F.sum(col).alias(out))
        elif fn == "count":
            cols.append(
                (F.count(F.lit(1)) if col == "*" else F.count(col)).alias(out)
            )
        elif fn in ("min", "max"):
            cols.append(getattr(F, fn)(col).alias(out))
        elif fn == "dsum":
            cols.append(
                F.sum(F.col(col).cast("decimal(27,6)"))
                .cast("double")
                .alias(out)
            )
        elif fn == "avg":
            cols.append(
                (
                    F.sum(F.col(col).cast("decimal(27,6)")).cast("double")
                    / F.count(col)
                ).alias(out)
            )
    return df.groupBy(*keys).agg(*cols)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int | str = 16,
    salt_cols: Sequence[str] | None = None,
    whale_frac: float = 0.20,
    whale_min_rows: int = 100_000_000,
    auto_salts: int = 16,
    decision_out: dict | None = None,
) -> DataFrame:
    """Two-stage skew-spread aggregation, identical results to a direct
    ``df.groupBy(keys).agg(...)`` for DECOMPOSABLE aggregates.

    ``aggs`` maps output column → (input column, fn) with fn one of
    ``sum | count | min | max | dsum | avg`` (``"*"`` as the input column
    counts rows). ``dsum``/``avg`` use the engine's exact-decimal sums
    (:mod:`yelp_recommender_spark.functions.exact_agg`): the partial stage
    keeps the DECIMAL type and only the final stage casts back to DOUBLE,
    so salting cannot perturb the reproducible-sum guarantee.

    ``n_salts="auto"`` runs the Misra-Gries whale guard (one
    bounded-state scan) and engages the two-stage plan ONLY when a key
    holds ≥ ``whale_frac`` of the rows and ≥ ``whale_min_rows`` rows;
    otherwise the one-stage plan runs. For decomposable aggregates a
    whale key compresses to ONE partial row per map task whatever its
    size, so the measured verdict (the r6 negative: plain beat salted
    at every whale size up to 40M rows) is that auto should almost
    never engage — ``whale_min_rows`` defaults ABOVE the measured
    range, and the guard's everyday product is the decision RECORD
    (``decision_out``: whale evidence attached to the run report), not
    a plan flip. Results identical either way.

    Non-decomposable aggregates (distinct counts, percentiles, collect_*)
    cannot be salted this way — use their dedicated operators
    (re-expression IS the measured remedy for those shapes: see the
    module docstring)."""
    if n_salts == "auto":
        decision = _whale_guard(
            df, salt_cols or keys, whale_frac, whale_min_rows
        )
        decision["plan"] = "salted" if decision["engaged"] else "plain"
        if decision_out is not None:
            decision_out.update(decision)
        if not decision["engaged"]:
            return _plain_aggregate(df, keys, aggs)
        n_salts = auto_salts
    elif not isinstance(n_salts, int):
        raise ValueError(f"n_salts must be an int or 'auto', got {n_salts!r}")
    partials: list[Column] = []
    finals: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn not in _DECOMP:
            raise ValueError(f"unsupported salted aggregate fn {fn!r}")
        c = F.count(F.lit(1)) if col == "*" else None
        if fn == "sum":
            partials.append(F.sum(col).alias(out))
            finals.append(F.sum(out).alias(out))
        elif fn == "count":
            partials.append(
                (c if c is not None else F.count(col)).alias(out)
            )
            finals.append(F.sum(out).alias(out))
        elif fn in ("min", "max"):
            f = getattr(F, fn)
            partials.append(f(col).alias(out))
            finals.append(f(out).alias(out))
        elif fn == "dsum":
            partials.append(
                F.sum(F.col(col).cast("decimal(27,6)")).alias(out)
            )
            finals.append(F.sum(out).cast("double").alias(out))
        elif fn == "avg":
            partials.append(
                F.sum(F.col(col).cast("decimal(27,6)")).alias(f"__{out}_s")
            )
            partials.append(F.count(col).alias(f"__{out}_n"))
            finals.append(
                (
                    F.sum(f"__{out}_s").cast("double")
                    / F.sum(f"__{out}_n")
                ).alias(out)
            )
    salted = with_salt(df, n_salts, cols=salt_cols)
    partial = salted.groupBy(*keys, "_salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def detect_skew(
    df: DataFrame,
    key_cols: Sequence[str],
    min_frac: float = 0.01,
    k: int = 256,
    n_buckets: int = 64,
) -> DataFrame:
    """One-pass whale-key detector feeding the measured remedy
    hierarchy above: BEFORE running a join/aggregate/window over
    ``key_cols`` at scale, find every key holding at least ``min_frac``
    of the rows, with guaranteed bounds. Output: the key columns +
    ``n_lo``/``n_hi`` (guaranteed count interval), ``n_total``, and
    ``frac_lo``/``frac_hi``. Detection is GUARANTEED (not
    probabilistic) for any key above ``min_frac + 1/(k+1)`` of the
    rows; reported fractions are exact within the interval.

    Shape: Misra-Gries partials per hash bucket (parallel bounded rank
    windows — never a global rank over all distinct keys), then one
    :func:`~yelp_recommender_spark.operators.sketch.mg_rollup` over the
    ≤ buckets·(k+1) surviving rows. Bounded state whatever the key
    cardinality, one scan of ``df`` — cheap enough to run as a guard
    in front of the expensive shuffle it is protecting."""
    from yelp_recommender_spark.operators.profile import _c
    from yelp_recommender_spark.operators.sketch import (
        mg_heavy_hitters,
        mg_rollup,
        mg_state,
    )

    # hostile-name-safe references (plain F.col PARSEs names: a dotted
    # or backticked key column would misbind or break — profile.py's
    # convention), and the bucket hash takes the struct itself
    keyed = df.select(
        F.struct(*[_c(df, c).alias(c) for c in key_cols]).alias("_key")
    ).withColumn(
        "_b", F.pmod(F.xxhash64(F.col("_key")), F.lit(int(n_buckets)))
    )
    # the per-bucket partial is the bounded boundary (≤ buckets·(k+1)
    # rows): mg_rollup references its input several times, and without
    # this pin each reference would recompute the FULL table scan +
    # exact-count aggregation upstream — measured 2.3× the guard's
    # whole cost on a 600k-row input. The pin is LOCAL, not the session
    # registry: the rollup result is itself bounded (≤ k+2 rows), so it
    # is materialized to the driver here and the partial unpersisted
    # immediately — a long-lived session calling the guard repeatedly
    # accumulates nothing (r9 ADVICE), and the returned frame re-reads
    # driver rows instead of rescanning the table on every consumption
    partial = mg_state(keyed, ["_b"], "_key", k=k).persist()
    try:
        lazy_rolled = mg_rollup(partial, [])
        rolled = df.sparkSession.createDataFrame(
            lazy_rolled.collect(), lazy_rolled.schema
        )
    finally:
        partial.unpersist()
    hh = mg_heavy_hitters(rolled, min_frac=min_frac)
    total = F.col("mg_n").cast("double")
    return hh.select(
        *[F.col("item").getField(c).alias(c) for c in key_cols],
        "n_lo",
        "n_hi",
        F.col("mg_n").alias("n_total"),
        (F.col("n_lo").cast("double") / total).alias("frac_lo"),
        (F.col("n_hi").cast("double") / total).alias("frac_hi"),
    )
