"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick the raw-corpus documents whose hashed n-gram
distribution looks like a TARGET corpus, by importance weights computed
in a feature space cheap enough for 100 TB.

The published recipe, re-expressed as DataFrame algebra:

1. Hash each document's unigrams + bigrams into ``dim`` buckets
   (feature hashing — no vocabulary state, the same property the
   engine's hashed TF-IDF vectorizer exploits).
2. Fit two bag-of-buckets multinomials: p from the target corpus, q
   from the raw corpus, add-α smoothed. The fit state is ONE table of
   ``dim`` rows — independent of corpus size.
3. Score every raw document with its log importance weight
   ``log w(x) = Σ_b c_b(x) · (log p_b − log q_b)`` — a broadcast join
   of the exploded gram stream against the dim-row weight table plus
   one hash-aggregation. No Python, no driver materialization of
   anything but the dim-row table.
4. Resample k documents WITHOUT replacement with probability ∝ w(x)
   via the Gumbel-top-k trick: key = log w + Gumbel noise, take the
   global top k. The noise is seeded ``xxhash64(doc_id, seed)`` mapped
   through −log(−log u) — deterministic, layout-independent, and
   reproducible across runs (a ``rand()`` here would make the selected
   training set irreproducible, the one thing a data pipeline must
   never be).

Scale notes: the only state that crosses the driver or a broadcast is
the dim-row weight table (default 10k rows). Both fits are single
hash-aggregations over exploded gram streams (map-side partial
aggregation collapses each task to ≤ dim rows). The resample is the
engine's standard global top-k. Setting ``dim`` trades estimator bias
(hash collisions) for state size exactly as in the paper (they use
10k).

No reference counterpart — beyond-reference training-data surface,
same family as the quality classifier (`operators/qualityclf.py`) and
SemDeDup (`operators/semdedup.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.curation import bigram_array

__all__ = [
    "dsir_grams",
    "dsir_fit",
    "dsir_score",
    "dsir_resample",
    "dsir_select",
]


def dsir_grams(toks: Column | str = "toks") -> Column:
    """Unigrams + bigrams of a token array (the paper's feature set).
    Bigrams join with a space so "a b" is distinct from token "ab"."""
    t = F.col(toks) if isinstance(toks, str) else toks
    return F.concat(t, bigram_array(t))


def _bucket(gram: Column, dim: int) -> Column:
    return F.pmod(F.xxhash64(gram), F.lit(int(dim)))


def _bucket_counts(
    docs: DataFrame, toks_col: str, dim: int
) -> DataFrame:
    """Corpus-wide bucket counts (≤ dim rows): one explode + one
    hash-aggregation; partial aggregation bounds every map task's
    output at dim rows before the single shuffle."""
    return (
        docs.select(F.explode(dsir_grams(toks_col)).alias("gram"))
        .groupBy(_bucket(F.col("gram"), dim).alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    toks_col: str = "toks",
    dim: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """The DSIR weight table: ``(bucket, log_ratio, dsir_dim)`` with
    ``log_ratio = log p̂_b − log q̂_b``, p̂ the add-α-smoothed hashed
    n-gram multinomial of the target corpus and q̂ the raw corpus's.
    Exactly ``dim`` rows whatever the corpus sizes (the table is built
    on a ``spark.range(dim)`` spine so never-seen buckets carry their
    smoothed weight too); the stamp column guards scoring against a
    mismatched ``dim`` (a different modulus would silently scramble
    every weight)."""
    spark = target.sparkSession
    tc = _bucket_counts(target, toks_col, dim)
    rc = _bucket_counts(raw, toks_col, dim)
    spine = spark.range(dim).select(F.col("id").alias("bucket"))
    joined = (
        spine.join(tc.withColumnRenamed("c", "ct"), "bucket", "left")
        .join(rc.withColumnRenamed("c", "cr"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    # totals as 1-row broadcast folds (the engine's scalar-fold idiom)
    totals = joined.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    a = float(alpha)
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + a) / (F.col("nt") + a * dim))
                - F.log((F.col("cr") + a) / (F.col("nr") + a * dim))
            ).alias("log_ratio"),
        )
        .withColumn("dsir_dim", F.lit(int(dim)))
    )


def _weights_dim(weights: DataFrame) -> int:
    head = weights.select("dsir_dim").head(1)
    return int(head[0][0]) if head else 0


def dsir_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """``docs`` plus ``logw`` — each document's log importance weight
    under the fitted table. Plan: explode grams → broadcast-join the
    dim-row weight table (asserted by test — the huge exploded gram
    side is never shuffled to meet the weights) → one hash-aggregation
    back to doc grain → join onto ``docs``. A doc
    with zero grams scores 0.0 (the weight of an empty product), not
    NULL — NULL would silently survive every threshold filter."""
    dim = _weights_dim(weights)
    if dim <= 0:
        raise ValueError("weights table carries no dsir_dim stamp")
    grams = docs.select(
        F.col(id_col), F.explode(dsir_grams(toks_col)).alias("gram")
    ).select(id_col, _bucket(F.col("gram"), dim).alias("bucket"))
    per_doc = (
        grams.join(
            F.broadcast(weights.select("bucket", "log_ratio")), "bucket"
        )
        .groupBy(id_col)
        .agg(F.sum("log_ratio").alias("_logw"))
    )
    return docs.join(per_doc, id_col, "left").withColumn(
        "logw", F.coalesce(F.col("_logw"), F.lit(0.0))
    ).drop("_logw")


def dsir_resample(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    seed: int = 0,
) -> DataFrame:
    """k rows sampled WITHOUT replacement with probability ∝ exp(logw)
    — the Gumbel-top-k construction: key = logw + Gumbel(0,1) noise,
    global top k. The noise is a deterministic function of
    ``(doc_id, seed)``, so the selection is reproducible and
    partitioning-independent; ties (impossible short of a 64-bit hash
    collision) break on the id. The top-k is rank-based, never a full
    global sort collected anywhere."""
    u = (
        F.xxhash64(F.col(id_col), F.lit(int(seed))).cast("double")
        + F.lit(2.0**63)
        + F.lit(0.5)
    ) / F.lit(2.0**64)
    gumbel = -F.log(-F.log(u))
    keyed = scored.withColumn("_gkey", F.col(logw_col) + gumbel)
    return (
        keyed.orderBy(F.col("_gkey").desc(), F.col(id_col))
        .limit(int(k))
        .drop("_gkey")
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    k: int,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    dim: int = 10_000,
    alpha: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """The whole recipe: fit on (target, raw), score raw, resample k.
    Returns the selected raw rows with their ``logw``."""
    weights = dsir_fit(target, raw, toks_col=toks_col, dim=dim, alpha=alpha)
    scored = dsir_score(raw, weights, id_col=id_col, toks_col=toks_col)
    return dsir_resample(scored, k, id_col=id_col, seed=seed)
