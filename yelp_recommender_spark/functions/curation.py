"""Shared column builders for the curation surface.

One definition serves three consumers — the oracle-gated catalog queries
(q73/q76/q78), the end-to-end pipeline (:mod:`yelp_recommender_spark.curate`),
and the tests — so the expression the DuckDB oracle checks IS the
expression the production pipeline runs (a drifted copy would pass the
oracle while the pipeline computed something else).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_token_count(toks: Column | str = "toks") -> Column:
    """Occurrences of the most frequent token in the array — the
    numerator of the Gopher-style top-token fraction. Per-row JVM
    reduction (O(unique × n)), no shuffle."""
    return F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda u: F.size(F.filter(toks, lambda x: x == u)),
        )
    )


def bigram_array(toks: Column | str = "toks") -> Column:
    """Adjacent-token bigrams as ``array<string>`` (empty when fewer
    than 2 tokens) — zip of shifted slices, JVM-side."""
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    )


def dup_bigram_fraction(toks: Column | str = "toks") -> Column:
    """1 − distinct/total over adjacent bigrams; NULL when no bigrams."""
    bgs = bigram_array(toks)
    n_bg = F.size(bgs)
    return F.when(n_bg == 0, F.lit(None).cast("double")).otherwise(
        1.0 - F.size(F.array_distinct(bgs)) / n_bg
    )


def distinct_ngrams(toks: Column | str = "toks", n: int = 5) -> Column:
    """Distinct n-token shingle strings of the array (space-joined).
    Caller must filter ``size(toks) >= n`` first — ``sequence`` with a
    negative span is undefined."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def mixture_weights(per_source: DataFrame, alpha: float) -> DataFrame:
    """Temperature-scaled sampling weights over a per-source aggregate
    carrying ``n_tokens``: p_s^alpha renormalized, rounded to 6. The
    unpartitioned windows run over the #sources-row aggregate, never the
    corpus."""
    total = Window.partitionBy()
    raw = F.pow(
        F.col("n_tokens") / F.sum("n_tokens").over(total).cast("double"),
        F.lit(alpha),
    )
    return per_source.withColumn("raw", raw).withColumn(
        "mix_weight", F.round(F.col("raw") / F.sum("raw").over(total), 6)
    ).drop("raw")


def bigram_lm_bits_per_token(
    docs: DataFrame,
    doc_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """(doc, n_bigrams, bits_per_token): every document scored under an
    add-0.5-smoothed bigram language model trained on the corpus ITSELF
    in one aggregation pass — the model-based quality signal behind q86
    and the curate pipeline's perplexity filter. High bits/token =
    off-distribution text (boilerplate, gibberish). Documents with < 2
    tokens have no bigrams and are absent from the result (callers
    decide their fate).

    The score is −mean log2 P(w2|w1) with P = (c12 + 0.5)/(c1 + 0.5·V);
    the mean uses an exact decimal sum so rankings are partition-order
    independent (oracle-reproducible — q86 gates this exact pipeline).
    "Per token" means per PREDICTED token — the n−1 bigram predictions
    (a bigram model cannot score a document's first token), the
    standard normalization for n-gram LM surprisal; thresholds tuned
    against per-ALL-tokens conventions run ~n/(n−1) hot on short docs.

    Scale: two hash aggregations over uniform token keys + hash joins
    back; the trained LM is itself a DataFrame — persist the counts to
    amortize over incremental scoring runs."""
    from yelp_recommender_spark.functions.exact_agg import dsum

    from yelp_recommender_spark.cache import register_persist

    bg = docs.filter(F.size(toks_col) >= 2).select(
        doc_col, F.explode(bigram_array(toks_col)).alias("bigram")
    )
    # pinned: the bigram-count table is the trained LM's backbone and
    # has two consumers below (the scored keyed view + the left-context
    # re-aggregation) — vocabulary-sized, one stream aggregation instead
    # of one per consumer (released at the pipeline boundary)
    bgc = register_persist(
        bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    )
    # left-context counts RE-AGGREGATE the bigram counts (c1 = Σ c12
    # over bigrams sharing w1 — integer counts, exactly the occurrence
    # count) instead of a second full aggregation over the occurrence
    # stream, and the whole LM lands in ONE vocabulary-sized score
    # table, so the stream is joined ONCE below instead of twice (r10;
    # the per-bigram logp values are bit-identical, so the per-document
    # exact decimal sum is unchanged).
    keyed = bgc.withColumn("w1", F.substring_index("bigram", " ", 1))
    ugc = keyed.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = docs.select(F.explode(toks_col).alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    lm = (
        keyed.join(ugc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.log2(
                (F.col("c12") + F.lit(0.5))
                / (F.col("c1") + F.lit(0.5) * F.col("v"))
            ).alias("logp"),
        )
    )
    scored = bg.join(lm, "bigram").select(doc_col, "logp")
    return scored.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-dsum("logp") / F.count(F.lit(1)), 6).alias(
            "bits_per_token"
        ),
    )
