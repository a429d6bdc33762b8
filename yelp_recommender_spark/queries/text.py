"""Text-analysis queries over the documents table.

Covers the reference's tokenize → DF/TF → TF-IDF pipeline (SURVEY.md §2.4
A2-A5, §2.8 F1-F3; ``/root/reference/models/content_based_model.py:46-180``)
restated as DataFrame aggregations, plus the LLM-data-pipeline text
operators the north star adds: token counting, language-ID heuristic,
quality scoring, document fingerprinting, n-gram extraction.

Oracle parity: the canonical tokenizer (lower → non-alphanumeric to space →
split → drop empties) is expressed identically in Spark Column algebra
(:func:`yelp_recommender_spark.functions.text.tokens_col`) and in the
DuckDB SQL fragment :data:`DUCK_TOKS`. All ratios are int/int IEEE divides
(bit-identical across engines); tfidf is rounded to 6 digits before any
ordering so ties resolve identically.

Scale notes: every query here is explode → hash-aggregate with map-side
partials; the token dimension tables (DF, vocab) are broadcast back. No
driver collection anywhere, so the same plans run at 100 TB — the explode
multiplies rows ~100× but the first partial aggregate collapses them
before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.text import tokens_col
from yelp_recommender_spark.operators.tfidf import document_frequency, tfidf
from yelp_recommender_spark.functions.exact_agg import dsum_expr
from yelp_recommender_spark.operators.topk import top_k_global
from yelp_recommender_spark.queries.registry import query
from yelp_recommender_spark.sources.tables import load_tables

# DuckDB twin of functions.text.tokens_col — keep in sync.
DUCK_TOKS = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' '), t -> t != '')"
)

# Tiny deterministic English-marker list for the language-ID heuristic.
EN_MARKERS = ["the", "a", "of", "and", "to", "in", "is"]


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition: the documents file is one thin scan split but the
    # token work downstream is CPU-bound — fan out to all cores (no-op
    # at real scale where the scan has many splits). Persisted via the
    # session cache registry: seven text queries share this exact plan
    # within a session (q20-q26), and q22's tf/df aggregates both consume
    # it — one tokenization pass instead of one per aggregate
    # (MEMORY_AND_DISK: spills, never OOMs); clear_caches() releases it
    # at the pipeline boundary (cache hygiene).
    from yelp_recommender_spark.cache import register_persist

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    par = docs.sparkSession.sparkContext.defaultParallelism
    return register_persist(
        # explicit projection: the cache carries exactly what its
        # consumers read (q24 text, q23 lang, q25 source) — an unselected
        # column (n_chars) would ride through the repartition shuffle AND
        # the cache at full corpus width (caught by tests/test_plans.py)
        docs.select("doc_id", "text", "lang", "source")
        .repartition(par, "doc_id")
        .withColumn("toks", tokens_col("text"))
    )


# --------------------------------------------------------------------------
@query(
    "q20_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_unique,
           CASE WHEN len(toks) = 0 THEN NULL
                ELSE len(array_to_string(toks, '')) / len(toks) END
               AS avg_token_len
    FROM t
    """,
)
def q20_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting (LLM-pipeline op; whitespace tokenizer).

    Scale: narrow map-only plan — no shuffle at all; the tokenizer is a
    codegen'd JVM expression, ~scan-speed.
    """
    d = _docs_tokens(spark, sf_dir)
    n = F.size("toks")
    total_len = F.aggregate(
        "toks", F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_unique"),
        F.when(n == 0, F.lit(None).cast("double"))
        .otherwise(total_len / n)
        .alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
@query(
    "q21_term_doc_frequency",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({DUCK_TOKS}) AS token FROM documents
    )
    SELECT token,
           COUNT(DISTINCT doc_id) AS df,
           COUNT(*) AS total_tf
    FROM toks GROUP BY token
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def q21_term_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency + corpus term frequency with the reference's
    rare-term prune (A2 + P3, ``content_based_model.py:108-127,168``)."""
    d = _docs_tokens(spark, sf_dir)
    long = d.select("doc_id", F.explode("toks").alias("token"))
    return (
        long.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("total_tf"),
        )
        .filter(F.col("df") > 1)
    )


# --------------------------------------------------------------------------
@query(
    "q22_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({DUCK_TOKS}) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token,
           ROUND(MAX(tf * log2(n_docs / df)), 6) AS max_tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    GROUP BY token
    ORDER BY max_tfidf DESC, token ASC
    LIMIT 50
    """,
)
def q22_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K vocabulary by max TF-IDF (A3-A5 + W1,
    ``content_based_model.py:146-176``) with deterministic tie-breaks.

    Scale: two hash aggregates + a broadcast of the vocabulary-sized DF
    table + TakeOrderedAndProject — never a full sort. The corpus count
    is a broadcast scalar folded into the plan, not a separate driver
    ``count()`` action.
    """
    toks = _docs_tokens(spark, sf_dir)
    # corpus count off the CACHED token table (one row per document —
    # _docs_tokens projects the whole documents table), not a second
    # parquet scan of documents (r10 scan audit: 2 scans → 1)
    n_docs = toks.agg(F.count(F.lit(1)))
    long = toks.select(
        "doc_id", F.explode("toks").alias("token")
    )
    scored = tfidf(long, n_docs=n_docs)
    per_term = scored.groupBy("token").agg(
        F.round(F.max("tfidf"), 6).alias("max_tfidf")
    )
    return top_k_global(per_term, "max_tfidf", 50, tiebreak="token")


# --------------------------------------------------------------------------
_MARKERS_SQL = ", ".join(f"'{m}'" for m in EN_MARKERS)


@query(
    "q23_language_id",
    oracle=f"""
    WITH t AS (SELECT lang, {DUCK_TOKS} AS toks FROM documents),
    scored AS (
        SELECT lang,
               CASE WHEN len(toks) > 0 AND
                         len(list_filter(toks, x -> x IN ({_MARKERS_SQL})))
                         / len(toks) >= 0.05
                    THEN 'en' ELSE 'other' END AS predicted
        FROM t
    )
    SELECT lang, predicted, COUNT(*) AS n_docs
    FROM scored GROUP BY lang, predicted
    """,
)
def q23_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (LLM-pipeline op): English-marker token ratio
    ≥ 5% → 'en'. Confusion-matrix output against the labeled ``lang``.

    A production engine would swap the marker list for per-language n-gram
    profiles — same plan shape (per-row expression + one aggregate).
    """
    d = _docs_tokens(spark, sf_dir)
    markers = F.array(*[F.lit(m) for m in EN_MARKERS])
    n = F.size("toks")
    hits = F.size(F.filter("toks", lambda t: F.array_contains(markers, t)))
    predicted = F.when(
        (n > 0) & (hits / n >= 0.05), F.lit("en")
    ).otherwise(F.lit("other"))
    return (
        d.withColumn("predicted", predicted)
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
@query(
    "q24_doc_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, {DUCK_TOKS} AS toks,
               length(text) AS len_text,
               length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           ROUND(CASE WHEN len_text = 0 THEN 0.0
                      ELSE n_alpha / len_text END, 6) AS alpha_ratio,
           ROUND(CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE len(list_filter(toks, x -> x IN ({_MARKERS_SQL})))
                           / len(toks) END, 6) AS stopword_ratio,
           ROUND(CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0
                      ELSE 0.5 END
                 * (CASE WHEN len_text = 0 THEN 0.0
                         ELSE n_alpha / len_text END), 6) AS quality_score
    FROM t
    """,
)
def q24_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring (LLM-pipeline op): alpha ratio,
    stopword ratio, length-gated composite score. Pure per-row expressions
    — map-only, scan-bound at any scale."""
    d = _docs_tokens(spark, sf_dir)
    len_text = F.length("text")
    n_alpha = F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
    n = F.size("toks")
    markers = F.array(*[F.lit(m) for m in EN_MARKERS])
    hits = F.size(F.filter("toks", lambda t: F.array_contains(markers, t)))
    alpha_ratio = F.when(len_text == 0, F.lit(0.0)).otherwise(n_alpha / len_text)
    stop_ratio = F.when(n == 0, F.lit(0.0)).otherwise(hits / n)
    len_gate = F.when((n >= 10) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(len_gate * alpha_ratio, 6).alias("quality_score"),
    )


# --------------------------------------------------------------------------
@query(
    "q25_doc_fingerprint",
    oracle=f"""
    WITH t AS (
        SELECT source,
               md5(array_to_string(list_sort(list_distinct({DUCK_TOKS})), ' '))
                   AS fingerprint
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT fingerprint) AS n_unique_fingerprints
    FROM t GROUP BY source
    """,
)
def q25_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (LLM-pipeline op): md5 of the sorted
    distinct-token bag — order-insensitive near-identity for shuffled
    duplicates. md5 is bit-identical across engines (hex of UTF-8)."""
    d = _docs_tokens(spark, sf_dir)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("toks"))))
    return (
        d.withColumn("fingerprint", fp)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique_fingerprints"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q26_top_bigrams",
    oracle=f"""
    WITH t AS (SELECT {DUCK_TOKS} AS toks FROM documents),
    bg AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
                   AS bigram
        FROM t
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 30
    """,
)
def q26_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top n-gram extraction (LLM-pipeline op; UDTF-shaped explode —
    SURVEY.md §2.10). Bigrams via zip_with on shifted slices — JVM-side,
    no UDF."""
    d = _docs_tokens(spark, sf_dir)
    n = F.size("toks")
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice("toks", 1, n - 1),
            F.slice("toks", 2, n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    )
    counted = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return top_k_global(counted, "n", 30, tiebreak="bigram")


# --------------------------------------------------------------------------
# BPE-ish piece pattern: runs of letters / runs of digits / runs of other
# non-space — the shape of a byte-pair pre-tokenizer's coarse split,
# portable between Java regex (Spark) and RE2-ish (DuckDB).
BPE_PIECE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


@query(
    "q27_token_counts",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS n_ws_tokens,
           len({DUCK_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '{BPE_PIECE_RE}')) AS n_bpe_pieces
    FROM documents
    """,
)
def q27_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways (LLM-pipeline op): whitespace split,
    the canonical lower/strip tokenizer, and a BPE-ish piece count
    (letter runs / digit runs / punctuation runs — the coarse split a
    byte-pair pre-tokenizer makes before merges). All per-row
    expressions — map-only at any scale; the regex families are chosen
    to evaluate identically in Java regex and the oracle's RE2."""
    d = _docs_tokens(spark, sf_dir)
    trimmed = F.trim("text")
    n_ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    return d.select(
        "doc_id",
        n_ws.cast("bigint").alias("n_ws_tokens"),
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PIECE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_pieces"),
    )


# --------------------------------------------------------------------------
@query(
    "q37_stratified_sample",
    oracle="""
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (
               WHERE substr(md5(CAST(doc_id AS STRING)), 1, 2) <
                     CASE source WHEN 'src0' THEN '80'
                                 WHEN 'src1' THEN '40'
                                 ELSE '20' END
           ) AS n_kept
    FROM documents GROUP BY source
    """,
)
def q37_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (LLM-pipeline op): per-source
    hash-gated keep rates (src0 50%, src1 25%, rest 12.5% — the corpus
    re-balancing move). The md5-prefix gate is reproducible across runs,
    partitionings, and engines — the oracle reproduces the EXACT kept
    set, not just its expectation; ``df.sample`` can do neither."""
    from yelp_recommender_spark.functions.sampling import stratified_gate

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    kept = stratified_gate(
        "doc_id", "source", {"src0": 0x80, "src1": 0x40}, default_keep_n=0x20
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_kept"),
    )


# --------------------------------------------------------------------------
@query(
    "q38_sample_n_per_group",
    oracle="""
    SELECT source, doc_id FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS STRING)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
)
def q38_sample_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-group deterministic sampling: 5 documents per
    source, ranked by md5(doc_id) — the balanced training-mix draw,
    identical rows on every run and in the oracle (full value check,
    not a count: the EXACT kept set matches)."""
    from yelp_recommender_spark.functions.sampling import sample_n_per_group

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return sample_n_per_group(docs, ["source"], "doc_id", 5).select(
        "source", "doc_id"
    )


# --------------------------------------------------------------------------
@query(
    "q28_cdc_chunk_fingerprints",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    e AS (SELECT doc_id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) AS pos FROM t),
    m AS (SELECT doc_id, pos, tok,
                 CASE WHEN substr(md5(tok), 1, 2) < '40' THEN 1 ELSE 0 END
                     AS b
          FROM e),
    c AS (SELECT doc_id, pos, tok,
                 SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS chunk
          FROM m),
    chunks AS (
        SELECT doc_id, chunk,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
        FROM c GROUP BY doc_id, chunk
    ),
    shared AS (SELECT fp, COUNT(DISTINCT doc_id) AS ndocs
               FROM chunks GROUP BY fp)
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           COUNT(*) FILTER (WHERE ndocs > 1) AS n_shared_chunks
    FROM chunks JOIN shared USING (fp)
    GROUP BY doc_id
    """,
)
def q28_cdc_chunk_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking via a rolling boundary rule — the
    partial-overlap dedup primitive (two documents sharing a paragraph
    share its chunk fingerprints even when the rest differs, which
    whole-doc hashing (q25) and bag-set MinHash (q32) both miss at the
    sub-document level).

    A token opens a new chunk iff md5(token) starts below '40'
    (P = 1/4 → expected 4-token chunks): content-defined boundaries, so
    an insertion resynchronizes within one chunk — the CDC property
    backup/dedup systems rely on, restated portably (the boundary rule
    is a string compare on an md5 prefix, bit-identical in the oracle).
    Output per doc: chunk count + how many chunks also appear elsewhere.

    Scale: one window (cumulative boundary sum) partitioned by doc, one
    hash-agg per (doc, chunk), one fingerprint-frequency agg — all
    shuffle on uniform keys; no driver state."""
    from pyspark.sql import Window

    d = _docs_tokens(spark, sf_dir)
    ex = d.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    boundary = F.when(
        F.substring(F.md5("tok"), 1, 2) < "40", 1
    ).otherwise(0)
    w = Window.partitionBy("doc_id").orderBy("pos")
    chunked = ex.withColumn("chunk", F.sum(boundary).over(w))
    chunks = chunked.groupBy("doc_id", "chunk").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            )
        ).alias("fp")
    )
    shared = chunks.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    return chunks.join(shared, "fp").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("ndocs") > 1, 1)).alias("n_shared_chunks"),
    )


# --------------------------------------------------------------------------
@query(
    "q85_weighted_sample",
    oracle="""
    SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source,
               CAST(length(text) AS BIGINT) AS n_chars,
               ROUND(
                   ln((CAST('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 12)
                            AS BIGINT) + 1) / 281474976710657.0)
                   / CAST(length(text) AS DOUBLE), 9) AS sk
        FROM documents WHERE length(text) > 0
    ) ORDER BY sk DESC, doc_id LIMIT 50
    """,
)
def q85_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement, deterministic in the key
    alone (Efraimidis–Spirakis A-ES): 50 documents drawn ∝ character
    count via a reproducible md5-derived uniform and the ln(u)/w
    selector — "sample docs proportional to length" with the EXACT row
    set gated by the oracle (``df.sample`` can neither weight per-row
    nor reproduce across partitionings).

    Scale: per-row map expression + global top-n (TakeOrderedAndProject:
    per-partition heaps, no global sort); the selector rounds to 9
    digits so last-ulp libm differences can never flip the boundary —
    ties then break on the key identically in both engines."""
    from yelp_recommender_spark.functions.sampling import weighted_sample_n

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    keyed = docs.select(
        "doc_id", "source", F.length("text").cast("bigint").alias("n_chars")
    )
    return weighted_sample_n(keyed, "doc_id", "n_chars", 50)


# --------------------------------------------------------------------------
@query(
    "q86_bigram_lm_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
                   AS bigram
        FROM t WHERE len(toks) >= 2
    ),
    bg2 AS (SELECT doc_id, bigram,
                   split_part(bigram, ' ', 1) AS w1 FROM bg),
    bgc AS (SELECT bigram, COUNT(*) AS c12 FROM bg2 GROUP BY bigram),
    ugc AS (SELECT w1, COUNT(*) AS c1 FROM bg2 GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v
              FROM (SELECT unnest(toks) AS tok FROM t)),
    scored AS (
        SELECT b.doc_id,
               log2((c12 + 0.5) / (c1 + 0.5 * v)) AS logp
        FROM bg2 b
        JOIN bgc USING (bigram) JOIN ugc USING (w1) CROSS JOIN vocab
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_bigrams,
               ROUND(-{dsum_expr('logp')} / COUNT(*), 6) AS bits_per_token
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, bits_per_token
    FROM agg ORDER BY bits_per_token DESC, doc_id LIMIT 20
    """,
)
def q86_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the model-based
    quality signal beyond q24's surface heuristics: train add-k-smoothed
    bigram statistics on the corpus itself (one aggregation pass), then
    score every document's bits-per-token under that model. The 20
    most-surprising documents (highest bits/token) surface boilerplate,
    gibberish, and off-distribution text — the perplexity-filter stage
    of a training-data pipeline, here fully relational and oracle-gated
    (KenLM-style scoring reduced to joins + log2).

    P(w2|w1) = (c(w1,w2) + 0.5) / (c(w1) + 0.5·V); bits/token =
    −mean log2 P over the doc's bigrams (exact decimal sum, so the
    ranking is partition-order-independent).

    Scale: two hash aggregations (bigram counts, left-context counts)
    + hash joins back on uniform token keys; the vocabulary size is a
    1-row cross join. No driver state, no UDFs — the LM "model" is
    itself a DataFrame, persistable and reusable for incremental
    scoring."""
    from yelp_recommender_spark.functions.curation import (
        bigram_lm_bits_per_token,
    )

    agg = bigram_lm_bits_per_token(_docs_tokens(spark, sf_dir))
    return (
        agg.orderBy(F.col("bits_per_token").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "n_bigrams", "bits_per_token")
    )


# --------------------------------------------------------------------------
@query(
    "q87_hashed_doc_vectors",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf
           FROM tok GROUP BY doc_id, token),
    dfr AS (SELECT token, COUNT(DISTINCT doc_id) AS df
            FROM tok GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM t),
    w AS (
        SELECT tf.doc_id,
               CAST('0x' || substr(md5(tf.token), 1, 4) AS BIGINT) % 64
                   AS dim,
               (1 - 2 * (CAST('0x' || substr(md5(tf.token), 5, 1)
                              AS BIGINT) % 2))
                   * tf.tf * log2(CAST(n_docs AS DOUBLE) / dfr.df) AS wgt
        FROM tf JOIN dfr USING (token) CROSS JOIN n
    )
    SELECT doc_id, CAST(dim AS INT) AS dim,
           ROUND({dsum_expr('wgt')}, 6) AS weight
    FROM w GROUP BY doc_id, dim
    """,
)
def q87_hashed_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) document vectors in long form —
    the bridge from text to the similarity surface: every document
    becomes a fixed 64-dim signed-hash TF-IDF vector with NO vocabulary
    dictionary anywhere (the reference kept its vocabulary as a driver
    dict, ``content_based_model.py:402``). The md5 hash family is the
    engine's portable convention, so the oracle reproduces the EXACT
    weights (signed sums via exact decimals) — murmur3-based HashingTF
    could never be gated this way.

    Scale: two hash aggregations + one vocabulary-sized broadcast join;
    unbounded vocabulary, bounded output (n_docs × ≤ n_dims rows).
    ``assemble_embeddings`` densifies the long form for the ANN ladder
    (tests feed these vectors through cosine near-dup end-to-end)."""
    from yelp_recommender_spark.operators.vectorizer import (
        hashed_tfidf_long,
    )

    d = _docs_tokens(spark, sf_dir)
    tokens_long = d.select("doc_id", F.explode("toks").alias("token"))
    n_docs = d.agg(F.count(F.lit(1)))
    return hashed_tfidf_long(tokens_long, n_dims=64, n_docs=n_docs)
