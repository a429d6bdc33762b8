"""Deterministic hash-gated sampling (LLM-data-pipeline op, greenfield —
the reference's only sampling is a seedless ``randomSplit``).

Training-data curation needs samples that are REPRODUCIBLE (same rows on
every run, any partitioning, any engine) and JOINABLE (the same key
always lands on the same side, so features sampled today join labels
sampled next month). Spark's ``df.sample`` is seeded per-partition —
repartition the input and the sample changes. The hash gate has neither
problem: keep a row iff the first two hex chars of ``md5(key)`` compare
below a threshold — md5 is uniform on its hex prefix, lexicographic
order on lowercase hex equals numeric order, and any engine with md5
reproduces the exact row set (the DuckDB oracle does, bit-for-bit).

Granularity is 1/256 (two hex chars); for finer control extend the
prefix — each extra char multiplies resolution by 16.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _hex2(keep_n: int) -> str:
    if not 0 <= keep_n <= 256:
        raise ValueError(f"keep_n must be in [0, 256], got {keep_n}")
    if keep_n == 256:
        # format() would give the 3-char "100", which sorts BELOW "2f"
        # etc. in the string compare; "g" sorts above every hex pair
        # ("ff" < "g"), so it keeps everything — same trick any engine's
        # string collation honors (ASCII 'g' > 'f')
        return "g"
    return format(keep_n, "02x")


def hash_sample_gate(key: Column | str, keep_n: int) -> Column:
    """Boolean gate keeping ≈ ``keep_n``/256 of rows, deterministically
    in the key alone. ``keep_n=256`` keeps everything; 0 keeps nothing
    (md5 hex chars are lowercase, all ≥ '0')."""
    return F.substring(F.md5(_c(key).cast("string")), 1, 2) < F.lit(
        _hex2(keep_n)
    )


def deterministic_sample(
    df: DataFrame, key: Column | str, keep_n: int
) -> DataFrame:
    """``df`` filtered to the ≈ keep_n/256 hash-gated sample.

    Scale: a pure per-row predicate — map-only, no shuffle, and stable
    under any repartitioning (unlike ``df.sample``, whose per-partition
    seeding changes the row set when the partitioning does)."""
    return df.filter(hash_sample_gate(key, keep_n))


def stratified_gate(
    key: Column | str,
    stratum: Column | str,
    keep_by_stratum: dict[str, int],
    default_keep_n: int = 0,
) -> Column:
    """Per-stratum hash gate: stratum s keeps ≈ keep_by_stratum[s]/256
    of its rows (``default_keep_n`` for unlisted strata) — the standard
    re-balancing move for over-represented sources in a training corpus.
    Insertion order of the dict is irrelevant (strata are disjoint)."""
    threshold = F.lit(_hex2(default_keep_n))
    for s, keep_n in keep_by_stratum.items():
        threshold = F.when(_c(stratum) == s, F.lit(_hex2(keep_n))).otherwise(
            threshold
        )
    return F.substring(F.md5(_c(key).cast("string")), 1, 2) < threshold


def stratified_sample(
    df: DataFrame,
    key: Column | str,
    stratum: Column | str,
    keep_by_stratum: dict[str, int],
    default_keep_n: int = 0,
) -> DataFrame:
    """``df`` filtered by :func:`stratified_gate` — map-only, no shuffle."""
    return df.filter(
        stratified_gate(key, stratum, keep_by_stratum, default_keep_n)
    )


def sample_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    n: int,
) -> DataFrame:
    """EXACTLY-N-per-group deterministic sample (vs the fractional gates
    above): rank each group's rows by ``md5(key)`` — a uniform shuffle
    that every engine reproduces — and keep the first ``n``. The
    balanced-per-source draw a training mix needs ("5k docs from every
    source, same 5k every run").

    Scale: one shuffle on the group key (the ranking window); skewed
    groups are bounded by AQE. Ties in md5 are broken by the key itself,
    so the kept set is total-order deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def md5_uniform(key: Column | str) -> Column:
    """Deterministic uniform in (0, 1]: the first 12 md5 hex chars of
    the stringified key as an integer, shifted to avoid exactly 0 (so
    ``ln`` downstream is always finite). 48 bits of hash → double is
    exact (< 2^53); any engine reproduces it bit-for-bit
    (DuckDB: ``(CAST('0x' || substr(md5(k),1,12) AS BIGINT) + 1) /
    281474976710657.0``)."""
    h = F.conv(
        F.substring(F.md5(_c(key).cast("string")), 1, 12), 16, 10
    ).cast("double")
    return (h + F.lit(1.0)) / F.lit(float(16**12 + 1))


def weighted_sample_n(
    df: DataFrame,
    key: str,
    weight: Column | str,
    n: int,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of ``n`` rows, deterministic
    in the key alone — Efraimidis–Spirakis A-ES: each row draws a
    reproducible uniform u from its key and ranks by u^(1/w); the top n
    by that key are an exact weighted sample. Rows with weight ≤ 0 are
    excluded (they have zero inclusion probability in the limit).

    The selector is ``round(ln(u)/w, 9)`` descending (monotone in
    u^(1/w); rounding absorbs last-ulp libm differences across engines,
    with ties broken by the key) — the whole construction replays in
    ANSI SQL, so a DuckDB oracle gates the exact row set (q85).

    Scale: a per-row map expression + global top-n (TakeOrderedAndProject
    — per-partition heaps, no global sort, no shuffle of non-winners).
    The standard curation move for "sample 1M docs ∝ token count"."""
    w = _c(weight).cast("double")
    skey = F.round(F.log(md5_uniform(key)) / w, 9)
    return (
        df.filter(w > 0)
        .withColumn("_sk", skey)
        .orderBy(F.col("_sk").desc(), F.col(key))
        .limit(n)
        .drop("_sk")
    )
