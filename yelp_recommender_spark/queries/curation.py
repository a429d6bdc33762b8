"""Training-data curation queries — the corpus-preparation operators a
large-scale LLM data pipeline runs between raw scrape and tokenized
batches: repetition-based quality gates, PII redaction, benchmark
decontamination, mixture weighting, deterministic global shuffle, and
sequence packing.

No reference counterpart (the reference stops at recommender features);
these extend the text surface (queries/text.py) with the curation steps
published pipelines describe (Gopher/C4-style repetition and quality
filters, n-gram decontamination against evaluation sets, source-mixture
temperature weighting, concat-and-chunk sequence packing).

All oracle-checked: every operator here is deterministic relational
algebra — the regex families are portable between Java regex (Spark) and
RE2 (DuckDB), ratios are int/int IEEE divides, float-accumulating outputs
round to 6 digits.

Scale notes per query are inline; the one nontrivial primitive is the
distributed prefix sum (:mod:`yelp_recommender_spark.operators.prefix`)
backing sequence packing — a global running total with no
single-partition stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_recommender_spark.queries.registry import query
from yelp_recommender_spark.queries.text import DUCK_TOKS, _docs_tokens
from yelp_recommender_spark.sources.tables import load_tables

# ---------------------------------------------------------------------------
# PII regexes — one family, two engines. Java regex and RE2 both support
# \b, \d, {m,n}; no backreferences or lookarounds (RE2 has neither).
# Case handled by explicit classes (not (?i)) so the pattern reads the
# same under both engines' flag semantics.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


# ---------------------------------------------------------------------------
@query(
    "q73_doc_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    m AS (
        SELECT doc_id, toks, len(toks) AS n,
               CASE WHEN len(toks) < 2 THEN []
                    ELSE list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1])
               END AS bgs
        FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CASE WHEN n = 0 THEN NULL
                ELSE round(list_max(list_transform(
                         list_distinct(toks),
                         u -> len(list_filter(toks, x -> x = u)))) / n, 6)
           END AS top_token_frac,
           CASE WHEN len(bgs) = 0 THEN NULL
                ELSE round(1.0 - len(list_distinct(bgs)) / len(bgs), 6)
           END AS dup_bigram_frac
    FROM m
    """,
)
def q73_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality metrics (Gopher-style filters): the
    most-frequent-token fraction and the duplicated-bigram fraction per
    document — the two signals that catch keyword-stuffed and
    boilerplate-looped text that perplexity filters miss.

    Scale: map-only — every metric is a per-row array expression (the
    token-frequency reduction is O(unique x n) per row, JVM-side, no
    shuffle at all). A filter on these columns pushes straight onto the
    scan."""
    from yelp_recommender_spark.functions.curation import (
        dup_bigram_fraction,
        top_token_count,
    )

    d = _docs_tokens(spark, sf_dir)
    n = F.size("toks")
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.when(n == 0, F.lit(None).cast("double"))
        .otherwise(F.round(top_token_count("toks") / n, 6))
        .alias("top_token_frac"),
        F.round(dup_bigram_fraction("toks"), 6).alias("dup_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# Deterministic PII fixture: the synthetic corpus contains no PII (no
# digits at all), so the redaction operator would trivially no-op. Plant
# engine-identical PII spans derived from doc_id — same expression in the
# oracle — so the scrub logic actually fires and the counts/lengths are a
# real gate (same move as q64's planted duplicate images).
_PLANT_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id ||"
    "          '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || doc_id % 256 ||"
    "          '.1' ELSE '' END"
)


@query(
    "q74_pii_redaction",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PLANT_SQL} AS text FROM documents),
    red AS (
        SELECT doc_id, text,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PHONE_RE}', '<PHONE>', 'g'),
                   '{IPV4_RE}', '<IP>', 'g') AS redacted
        FROM aug
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
               AS n_phones,
           CAST(len(regexp_extract_all(redacted, '{IPV4_RE}')) AS BIGINT)
               AS n_ips_remaining,
           CAST(length(redacted) AS BIGINT) AS redacted_len
    FROM red
    """,
)
def q74_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (emails, phone numbers, IPv4) over a
    deterministic planted fixture. ``n_ips_remaining`` counts on the
    REDACTED text — it must be 0 everywhere, which gates that the
    replacement chain actually consumed its matches (phones redact before
    the IP pass so the dotted phone tail can't alias as an address).

    Scale: map-only regex pipeline, whole-stage codegen, no shuffle; at
    100 TB this runs at scan speed and the redacted column writes
    straight back out."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    aug = docs.select("doc_id", F.expr(_PLANT_SQL).alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IPV4_RE,
        "<IP>",
    )
    red = aug.withColumn("redacted", redacted)
    count = lambda c, p: F.size(  # noqa: E731
        F.regexp_extract_all(c, F.lit(p), F.lit(0))
    ).cast("bigint")
    return red.select(
        "doc_id",
        count("text", EMAIL_RE).alias("n_emails"),
        count("text", PHONE_RE).alias("n_phones"),
        count("redacted", IPV4_RE).alias("n_ips_remaining"),
        F.length("redacted").cast("bigint").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
_SEQ_LEN = 256


@query(
    "q75_sequence_packing",
    oracle=f"""
    WITH t AS (SELECT doc_id, len({DUCK_TOKS}) AS n FROM documents),
    p AS (
        SELECT doc_id, n,
               CAST(SUM(n) OVER (ORDER BY doc_id) AS BIGINT) AS cum
        FROM t WHERE n > 0
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           (cum - n) // {_SEQ_LEN} AS first_block,
           (cum - 1) // {_SEQ_LEN} AS last_block,
           (cum - 1) // {_SEQ_LEN} - (cum - n) // {_SEQ_LEN} + 1 AS n_blocks
    FROM p
    """,
)
def q75_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): documents concatenated in
    doc_id order and sliced into fixed 256-token training blocks;
    per doc, which block its first/last token lands in — the map every
    packed-pretraining loader needs to trace an example back to its
    source documents.

    The global running token total uses the DISTRIBUTED prefix sum
    (:func:`~yelp_recommender_spark.operators.prefix.with_prefix_sum`):
    percentile-bucketed two-stage scan, no single-partition window — the
    difference between this plan and ``SUM OVER (ORDER BY)`` is exactly
    the difference between a 100-TB-viable packer and one task doing
    everything. Sums are LongType — exact, so block ids are
    bit-identical to the oracle."""
    from yelp_recommender_spark.operators.prefix import with_prefix_sum

    d = _docs_tokens(spark, sf_dir)
    t = d.select("doc_id", F.size("toks").cast("bigint").alias("n")).filter(
        F.col("n") > 0
    )
    p = with_prefix_sum(t, "doc_id", "n", out_col="cum")
    first = F.expr(f"(cum - n) div {_SEQ_LEN}")
    last = F.expr(f"(cum - 1) div {_SEQ_LEN}")
    return p.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        first.alias("first_block"),
        last.alias("last_block"),
        (last - first + 1).alias("n_blocks"),
    )


# ---------------------------------------------------------------------------
_MIX_ALPHA = 0.5


@query(
    "q76_source_mixture_weights",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({DUCK_TOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs, n_tokens,
               pow(n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE),
                   {_MIX_ALPHA}) AS raw
        FROM s
    )
    SELECT source, n_docs, n_tokens,
           round(raw / SUM(raw) OVER (), 6) AS mix_weight
    FROM w
    """,
)
def q76_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture weights: per-source token share
    p_s raised to alpha=0.5 and renormalized — the standard
    up-weighting of small high-quality sources when composing a training
    mixture (alpha=1 is proportional sampling, alpha=0 uniform).

    Scale: one hash aggregate to per-source totals (map-side partials),
    then all arithmetic happens on the ~#sources-row result — the
    unpartitioned windows at the end run over that bounded aggregate,
    never the corpus."""
    from yelp_recommender_spark.functions.curation import mixture_weights

    d = _docs_tokens(spark, sf_dir)
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("n_tokens"),
    )
    return mixture_weights(s, _MIX_ALPHA).select(
        "source", "n_docs", "n_tokens", "mix_weight"
    )


# ---------------------------------------------------------------------------
_N_SHARDS = 8
# Knuth multiplicative hash — pure BIGINT arithmetic, portable to any
# SQL engine (no engine hash function needed, so the oracle reproduces
# the exact shard assignment). The id is masked to 31 bits BEFORE the
# multiply so the product stays under 2^63 for any doc_id (an unmasked
# id >= ~3.47e9 would overflow int64 — ANSI error on Spark, silent
# HUGEINT divergence in DuckDB); ids congruent mod 2^31 share a shard,
# which is harmless for load-spreading.
_SHARD_SQL = (
    f"(doc_id % 2147483648) * 2654435761 % 4294967296 % {_N_SHARDS}"
)


@query(
    "q77_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST({_SHARD_SQL} AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY {_SHARD_SQL}
               ORDER BY md5(CAST(doc_id AS STRING)), doc_id
           ) AS BIGINT) AS pos_in_shard
    FROM documents
    """,
)
def q77_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order randomization:
    multiplicative-hash shard assignment + md5-ordered position within
    each shard. Reading shards round-robin yields a reproducible
    pseudo-random epoch order — no RNG state, so any worker can recompute
    any position (the property data loaders need for resumable training).

    Scale: the window partitions by shard — 8 here, thousands
    in production — so ordering work parallelizes per shard and no global
    sort ever happens."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    shard = F.expr(_SHARD_SQL).cast("bigint")
    w = Window.partitionBy(shard).orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return docs.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
_BENCH_SOURCE = "src0"
_GRAM_N = 5


@query(
    "q78_decontamination",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {DUCK_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   range(1, len(toks) - {_GRAM_N - 2}),
                   i -> array_to_string(toks[i:i + {_GRAM_N - 1}], ' ')
               ))) AS gram
        FROM t
    ),
    train AS (SELECT DISTINCT gram FROM g WHERE source <> '{_BENCH_SOURCE}'),
    bench AS (SELECT doc_id, gram FROM g WHERE source = '{_BENCH_SOURCE}')
    SELECT bench.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(train.gram) AS BIGINT) AS n_contaminated,
           round(COUNT(train.gram) / CAST(COUNT(*) AS DOUBLE), 6)
               AS contamination_rate
    FROM bench LEFT JOIN train ON bench.gram = train.gram
    GROUP BY bench.doc_id
    """,
)
def q78_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination check: treat source 'src0' as an
    evaluation set and measure, per eval document, how many of its
    distinct 5-gram spans also occur anywhere in the training sources —
    the n-gram overlap audit run before any corpus ships.

    Scale: grams are distinct-per-doc before the join (bounds fan-out at
    the document, not corpus, level) and the eval-vs-train membership
    test is a shuffled LEFT join on the gram hash key — uniform keys, no
    broadcast assumption (the training gram set is corpus-sized at
    100 TB). One final hash-agg per eval doc."""
    from yelp_recommender_spark.functions.curation import distinct_ngrams

    d = _docs_tokens(spark, sf_dir)
    g = d.filter(F.size("toks") >= _GRAM_N).select(
        "doc_id",
        "source",
        F.explode(distinct_ngrams("toks", _GRAM_N)).alias("gram"),
    )
    train = (
        g.filter(F.col("source") != _BENCH_SOURCE)
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    bench = g.filter(F.col("source") == _BENCH_SOURCE).select("doc_id", "gram")
    return (
        bench.join(train, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
            F.round(
                F.count("_hit") / F.count(F.lit(1)).cast("double"), 6
            ).alias("contamination_rate"),
        )
    )
