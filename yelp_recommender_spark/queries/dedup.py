"""Deduplication queries (LLM-data-pipeline surface): exact keep-first,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

The MinHash/LSH family generalizes the reference's hand-rolled user-CF
candidate machinery (``/root/reference/utils/minhash.py:7-30``,
``/root/reference/utils/lsh.py:23-40``) from ratings-shingles to text
shingles; the hash family here is the *portable* md5 construction
(:mod:`yelp_recommender_spark.operators.dedup`) so a DuckDB oracle
reproduces every signature bit-for-bit. Production would flip
``fast=True`` (xxhash64) — same plan shape, ~10× less hashing CPU.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.exact_agg import dsum
from yelp_recommender_spark.operators.ann import cosine_pairs_above_auto
from yelp_recommender_spark.operators.dedup import (
    blocked_jaccard_pairs,
    blocking_exclusions,
    minhash_lsh_pairs,
    simhash16,
    token_shingles,
)
from yelp_recommender_spark.queries.registry import query
from yelp_recommender_spark.queries.text import DUCK_TOKS
from yelp_recommender_spark.sources.tables import load_tables

# DuckDB twins of operators.dedup — keep in sync.
DUCK_SHINGLES3 = (
    "list_distinct(list_transform(range(1, len(toks) - 1),"
    " i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))"
)
DUCK_MINHASH16 = (
    "list_transform(range(0, 16), i -> list_min(list_transform(sh,"
    " s -> md5(CAST(i AS VARCHAR) || '|' || s))))"
)
DUCK_BANDS8 = (
    "list_transform(range(0, 8), j -> md5(CAST(j AS VARCHAR) || '#' ||"
    " array_to_string(sig[j * 2 + 1 : j * 2 + 2], '|')))"
)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles), built FROM the shared token cache
    (:func:`~yelp_recommender_spark.queries.text._docs_tokens`) — one
    tokenization pass feeds the seven text queries AND the dedup family,
    instead of the shingle pipeline re-tokenizing (or depending on an
    accidental cache-plan match). Load-bearing plan choices:

    1. ``toks`` is a materialized column of the cached table — passing
       the tokenizer *expression* into the shingle lambda would
       re-evaluate the full regex pipeline per ``element_at`` call
       (measured 8 ms/doc vs ~0.1 ms/doc), since common-subexpression
       elimination does not reach into higher-order-function lambdas.
    2. the short-doc filter is ``size(toks) >= 3`` (same predicate as the
       oracle's ``len(toks) >= 3``), **not** ``size(shingles) > 0``: a
       predicate over ``shingles`` would re-run the shingle chain per
       element when inlined (see 1).
    3. persisted via the session cache registry: q31 consumes this 3×
       (join sides + sizes), q32 2× (signature + verify), q35 2× — one
       shingle build per session, released by clear_caches().
    """
    from yelp_recommender_spark.cache import register_persist
    from yelp_recommender_spark.queries.text import _docs_tokens

    toks = _docs_tokens(spark, sf_dir)
    return register_persist(
        toks.filter(F.size("toks") >= 3)
        .select("doc_id", token_shingles("toks", k=3).alias("shingles"))
    )


# --------------------------------------------------------------------------
@query(
    "q30_dedup_keep_first",
    oracle="""
    WITH kept AS (
        SELECT event_type, value FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY epoch_us(ts), event_id) = 1
    )
    SELECT event_type, COUNT(*) AS n_kept,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS value_kept
    FROM kept GROUP BY event_type
    """,
)
def q30_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with keep-first-canonical semantics: one row per
    (user, event_type), earliest (ts, event_id) wins.

    ``dropDuplicates`` keeps an *arbitrary* row — non-deterministic under
    retries/partitioning, so the engine's canonical dedup is the
    row_number window (deterministic at any scale). One shuffle on the
    dedup key; the aggregate reuses nothing — low-cardinality regroup."""
    from yelp_recommender_spark.functions.eventtime import with_ts_us

    ev = with_ts_us(load_tables(spark, sf_dir, ["events"])["events"])
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    kept = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        dsum("value").alias("value_kept"),
    )


# --------------------------------------------------------------------------
@query(
    "q31_ngram_jaccard_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {DUCK_SHINGLES3} AS sh FROM t WHERE len(toks) >= 3),
    e AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    hot AS (SELECT s FROM e GROUP BY s HAVING COUNT(*) > 500),
    cold AS (SELECT * FROM e WHERE s NOT IN (SELECT s FROM hot)),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM cold a JOIN cold b ON a.s = b.s AND a.doc_id < b.doc_id
    )
    SELECT d1, d2,
           ROUND(len(list_intersect(x.sh, y.sh))
                 / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
                 6) AS jaccard
    FROM cand
    JOIN sh x ON d1 = x.doc_id
    JOIN sh y ON d2 = y.doc_id
    WHERE ROUND(len(list_intersect(x.sh, y.sh))
                / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
                6) >= 0.8
    """,
)
def q31_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-Jaccard near-dup pairs via shared-shingle blocking
    with a hot-shingle frequency cap (df ≤ 500) — never a cartesian
    product, and bounded even on boilerplate corpora (J4/P4 reimagined
    for text; SURVEY §7 risk register: pair blowup). Candidates from the
    capped blocking join, values from exact verification over the full
    shingle sets — the oracle mirrors both steps."""
    return blocked_jaccard_pairs(
        _doc_shingles(spark, sf_dir), threshold=0.8, df_cap=500
    )


# --------------------------------------------------------------------------
@query(
    "q35_blocking_exclusions",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {DUCK_SHINGLES3} AS sh FROM t WHERE len(toks) >= 3),
    e AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    hot AS (SELECT s FROM e GROUP BY s HAVING COUNT(*) > 10),
    cold_ids AS (
        SELECT DISTINCT doc_id FROM e WHERE s NOT IN (SELECT s FROM hot)
    )
    SELECT (SELECT COUNT(*) FROM hot) AS hot_shingles,
           (SELECT COUNT(*) FROM sh
            WHERE len(sh) > 0
              AND doc_id NOT IN (SELECT doc_id FROM cold_ids))
               AS fully_hot_docs
    """,
)
def q35_blocking_exclusions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df_cap blind-spot made measurable (ADVICE r2 #5): how many
    shingles the blocking cap excludes and how many documents become
    invisible to the q31 blocked join because ALL their shingles are hot.
    Cap 10 here (vs q31's production 500) so the measurement is exercised
    at test scale — the oracle mirrors the same cap."""
    return blocking_exclusions(_doc_shingles(spark, sf_dir), df_cap=10)


# --------------------------------------------------------------------------
@query(
    "q32_minhash_lsh_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    shs AS (SELECT doc_id, {DUCK_SHINGLES3} AS sh FROM t WHERE len(toks) >= 3),
    sigs AS (SELECT doc_id, sh, {DUCK_MINHASH16} AS sig FROM shs),
    bands AS (SELECT doc_id, unnest({DUCK_BANDS8}) AS bk FROM sigs),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT d1, d2,
           ROUND(len(list_intersect(x.sh, y.sh))
                 / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
                 6) AS jaccard
    FROM cand
    JOIN shs x ON d1 = x.doc_id
    JOIN shs y ON d2 = y.doc_id
    WHERE ROUND(len(list_intersect(x.sh, y.sh))
                / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
                6) >= 0.8
    """,
)
def q32_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(8 bands × 2 rows) near-dup candidates, verified
    with exact Jaccard ≥ 0.8 (M3/M4 generalized; recall at j=0.99 is
    1-(1-j²)^8 ≈ 1). The md5 signature construction is bit-identical in
    the oracle — the candidate sets match exactly, not just the verified
    output."""
    return minhash_lsh_pairs(
        _doc_shingles(spark, sf_dir),
        n_hashes=16,
        bands=8,
        threshold=0.8,
    )


# --------------------------------------------------------------------------
@query(
    "q33_simhash_docs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, list_distinct({DUCK_TOKS}) AS dt FROM documents
    ),
    h AS (
        SELECT doc_id, len(dt) AS n,
               list_transform(dt, t -> md5(t)) AS hs
        FROM t
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 16), j ->
               CASE WHEN 2 * len(list_filter(hs, h ->
                        ((strpos('0123456789abcdef',
                                 substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
                         // (8 >> CAST(j % 4 AS INT))) % 2 = 1)) > n
                    THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END))
               AS BIGINT) AS simhash
    FROM h
    """,
)
def q33_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over the distinct-token bag — the
    third dedup family (near-dups differ in few bits; exact dups collide).
    Pure per-row expression over the shared token cache — map-only at
    any scale, no second tokenization pass."""
    from yelp_recommender_spark.queries.text import _docs_tokens

    toks = _docs_tokens(spark, sf_dir)
    return toks.withColumn("dt", F.array_distinct("toks")).select(
        "doc_id", simhash16("dt").alias("simhash")
    )


# --------------------------------------------------------------------------
@query(
    "q34_embedding_neardup_pairs",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) >= 0.4
    """,
)
def q34_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (all id1<id2 with cos ≥ 0.4).

    Routed through the cardinality-based similarity-join planner
    (:func:`~yelp_recommender_spark.operators.ann.cosine_pairs_above_auto`):
    broadcast-index + Arrow-batch float64 matmul while the index fits an
    executor, SRP-LSH + exact re-score beyond ~5M vectors. At test scale
    the planner picks the exact broadcast path, so the oracle check stays
    exhaustive; the LSH fallback is pinned by tests/test_ann.py."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return cosine_pairs_above_auto(emb, threshold=0.4)
