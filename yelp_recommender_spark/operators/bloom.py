"""Bloom-filter semi-join reduction — cut the shuffled volume of a big
fact table by a compact probabilistic membership filter built from the
key side (the classic distributed "bloom join"; Spark's own runtime
bloom filtering, ``spark.sql.optimizer.runtime.bloomFilter.enabled``,
applies the same idea automatically but only under specific join shapes
— this operator makes it explicit, composable, and reusable across
stages).

When it wins at 100 TB: an exact broadcast semi-join needs the key side
resident as a hash set (8+ bytes/key plus overhead); a bloom at ~10
bits/key is ~6× smaller and, unlike an exact set, its size is chosen
up-front (m bits) independent of key width. For a key side too big to
broadcast exactly but whose BLOOM fits, the probe prunes the fact table
map-side BEFORE the exact shuffle join that guarantees correctness —
the shuffle then moves only (true matches + ε false positives) instead
of the whole fact table.

Everything is DataFrame algebra — no Python UDFs anywhere:

- build: per-key hash positions via JVM ``xxhash64(key, i)``, folded to
  a (chunk, bits) LONG-word table with ``bit_or`` partial aggregation
  (the bloom IS a DataFrame: m/64 rows, persistable, broadcastable);
- probe: ``n_hashes`` broadcast hash joins of the fact side against the
  word table (each maps one precomputed chunk column to its word) + a
  codegen'd bit-test conjunction. Map-side only — zero shuffles on the
  fact table.

False-positive rate for n keys in m bits with k hashes is the standard
(1 − e^{−kn/m})^k; :func:`bloom_fpp` computes it so callers can size m.
No false negatives ever (tests pin both properties). No reference
counterpart — beyond-reference scale surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_build",
    "bloom_probe",
    "bloom_semi_join",
    "bloom_fpp",
    "bloom_m_for_fpp",
]


def bloom_fpp(n_keys: int, m_bits: int, n_hashes: int) -> float:
    """Expected false-positive probability of a bloom with ``n_keys``
    inserted into ``m_bits`` using ``n_hashes`` hash functions."""
    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-n_hashes * n_keys / m_bits)) ** n_hashes


def bloom_m_for_fpp(n_keys: int, fpp: float = 0.01) -> int:
    """Bits needed for a target false-positive rate at the optimal hash
    count (m = −n·ln p / ln²2 — the textbook sizing), rounded up to a
    multiple of 64 so the word table has no ragged tail."""
    if n_keys <= 0:
        return 64
    m = -n_keys * math.log(fpp) / (math.log(2.0) ** 2)
    return ((int(m) // 64) + 1) * 64


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """The ``n_hashes`` bit positions of a key: ``xxhash64(key, i)``
    folded into [0, m_bits). Seeding by a literal second column gives
    independent hashes from one JVM-side family — the identical
    expression on build and probe sides is what makes no-false-negatives
    structural rather than probabilistic."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Build the bloom as a (chunk, bits, m_bits, n_hashes) word table:
    chunk = bit position div 64, bits = OR of the set masks. m_bits/64
    rows max. The build parameters ride along as literal columns so a
    persisted bloom can never be probed with mismatched parameters
    silently (:func:`bloom_probe` validates them — a wrong m_bits or
    n_hashes would produce false negatives, not an error).

    Scale: explode ×n_hashes, then ``bit_or`` hash-aggregation — the
    partial aggregation collapses each map task to ≤ m_bits/64 rows
    before the one (tiny) shuffle; the full key side is never collected
    anywhere."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = F.explode(
        F.array(*_positions(F.col(key_col), m_bits, n_hashes))
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.expr("pos div 64").alias("chunk"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
                "mask"
            ),
        )
        .groupBy("chunk")
        .agg(F.bit_or("mask").alias("bits"))
        .withColumn("m_bits", F.lit(int(m_bits)))
        .withColumn("n_hashes", F.lit(int(n_hashes)))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the bloom (superset of the
    true matches; false-positive rate per :func:`bloom_fpp`, false
    negatives impossible). Columns of ``df`` pass through unchanged.

    Plan shape: ``n_hashes`` broadcast hash joins against the word table
    + one codegen'd bit-test filter — map-side only, the probed table is
    never shuffled (tests assert the plan has no Exchange on the fact
    side). A bloom miss on ANY hash drops the row, so the left joins
    feed a conjunction over ``n_hashes`` word columns.

    Raises ``ValueError`` when the bloom carries build parameters (any
    table from :func:`bloom_build`) that disagree with the probe's —
    mismatched parameters would silently drop true matches otherwise.

    The probed key column must have the SAME data type the bloom was
    built from: ``xxhash64`` hashes e.g. INT and BIGINT of equal numeric
    value differently, so a dtype mismatch is a silent false-negative
    source (:func:`bloom_semi_join` casts the build side for you)."""
    if {"m_bits", "n_hashes"} <= set(bloom.columns):
        # the word table is ≤ m_bits/64 rows — this head() is cheap
        stamped = bloom.select("m_bits", "n_hashes").head(1)
        if stamped and (
            stamped[0][0] != m_bits or stamped[0][1] != n_hashes
        ):
            raise ValueError(
                f"bloom was built with (m_bits={stamped[0][0]}, "
                f"n_hashes={stamped[0][1]}) but probed with "
                f"({m_bits}, {n_hashes}) — this would silently produce "
                "false negatives"
            )
    out = df
    for i, pos in enumerate(_positions(F.col(key_col), m_bits, n_hashes)):
        out = out.withColumn(f"_bp{i}", pos)
    checks = []
    for i in range(n_hashes):
        b = F.broadcast(
            bloom.select(
                F.col("chunk").alias(f"_bc{i}"), F.col("bits").alias(f"_bw{i}")
            )
        )
        out = out.join(
            b,
            F.expr(f"_bp{i} div 64") == F.col(f"_bc{i}"),
            "left",
        )
        checks.append(
            F.expr(
                f"(shiftright(_bw{i}, cast(_bp{i} % 64 as int)) & 1) = 1"
            )
        )
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    drop = [f"_bp{i}" for i in range(n_hashes)]
    drop += [f"_bc{i}" for i in range(n_hashes)]
    drop += [f"_bw{i}" for i in range(n_hashes)]
    return out.filter(cond).drop(*drop)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    m_bits: int | None = None,
    n_hashes: int = 5,
    target_fpp: float = 0.01,
    n_small_keys: int | None = None,
) -> DataFrame:
    """EXACT semi-join of ``big`` against ``small``'s keys, with a bloom
    pre-filter cutting the shuffled volume: probe map-side first, then
    the ordinary semi-join (which only sees survivors) guarantees
    correctness — the bloom changes cost, never the result.

    ``m_bits`` defaults from ``target_fpp`` and the small side's key
    count (pass ``n_small_keys`` to skip the count scan when known —
    at 100 TB the caller usually knows it from catalog stats)."""
    small_key = small_key or big_key
    # unify key types BEFORE hashing: xxhash64 hashes INT and BIGINT of
    # the same numeric value differently, so a dtype mismatch between
    # sides would silently drop true matches (false negatives) — the one
    # thing this function promises never happens
    big_key_type = big.schema[big_key].dataType
    if m_bits is None:
        n = n_small_keys
        if n is None:
            from yelp_recommender_spark.operators.ann import (
                estimated_row_count,
            )

            n = estimated_row_count(small)
        if n is None:
            n = small.count()
        m_bits = bloom_m_for_fpp(int(n), target_fpp)
    keys = small.select(
        F.col(small_key).cast(big_key_type).alias(big_key)
    ).distinct()
    # the word table is consumed n_hashes+1 times (parameter check +
    # one broadcast per hash) — pin it via the session cache registry
    # so the build aggregation runs once (released by clear_caches() at
    # the pipeline boundary, the engine-wide hygiene convention)
    from yelp_recommender_spark.cache import register_persist

    bloom = register_persist(bloom_build(keys, big_key, m_bits, n_hashes))
    pruned = bloom_probe(big, big_key, bloom, m_bits, n_hashes)
    return pruned.join(keys, big_key, "left_semi")
