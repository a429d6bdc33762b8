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
    " s -> md5(CAST(i AS STRING) || '|' || s))))"
)
DUCK_BANDS8 = (
    "list_transform(range(0, 8), j -> md5(CAST(j AS STRING) || '#' ||"
    " array_to_string(sig[j * 2 + 1 : j * 2 + 2], '|')))"
)
# Verified MinHash-LSH pair pipeline as a reusable CTE chain (consumed by
# the q32 oracle standalone and by q68's component closure on top of it).
DUCK_LSH_PAIRS_CTES = f"""
    t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    shs AS (SELECT doc_id, {DUCK_SHINGLES3} AS sh FROM t WHERE len(toks) >= 3),
    sigs AS (SELECT doc_id, sh, {DUCK_MINHASH16} AS sig FROM shs),
    bands AS (SELECT doc_id, unnest({DUCK_BANDS8}) AS bk FROM sigs),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT d1, d2,
               ROUND(len(list_intersect(x.sh, y.sh))
                     / (len(x.sh) + len(y.sh)
                        - len(list_intersect(x.sh, y.sh))), 6) AS jaccard
        FROM cand
        JOIN shs x ON d1 = x.doc_id
        JOIN shs y ON d2 = y.doc_id
        WHERE jaccard >= 0.8
    )
"""


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
        SELECT event_type, value FROM (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) ranked WHERE rn = 1
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
    WITH {DUCK_LSH_PAIRS_CTES}
    SELECT d1, d2, jaccard FROM pairs
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
# SimHash pipeline as a reusable CTE chain (q33 at the portable 16-bit
# width; q69 at 63 bits for hamming-distance pair generation — the final
# CTE is named ``sh{bits}``).
def _duck_simhash_ctes(bits: int) -> str:
    """DuckDB twin of :func:`operators.dedup.simhash_bits`."""
    return f"""
    sdt AS (
        SELECT doc_id, list_distinct({DUCK_TOKS}) AS dt FROM documents
    ),
    sh AS (
        SELECT doc_id, len(dt) AS n,
               list_transform(dt, t ->
                   ('0x' || substr(md5(t), 1, 8))::BIGINT
                   + (('0x' || substr(md5(t), 9, 8))::BIGINT % 2147483648)
                     * 4294967296) AS hs
        FROM sdt
    ),
    sh{bits} AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, {bits}), j ->
                   CASE WHEN 2 * len(list_filter(hs, h ->
                            ((h >> CAST(j AS INT)) & 1) = 1)) > n
                        THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END))
                   AS BIGINT) AS simhash
        FROM sh
    )
"""


DUCK_SIMHASH16_CTES = _duck_simhash_ctes(16)


@query(
    "q33_simhash_docs",
    oracle=f"""
    WITH {DUCK_SIMHASH16_CTES}
    SELECT doc_id, simhash FROM sh16
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


# --------------------------------------------------------------------------
@query(
    "q68_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {DUCK_LSH_PAIRS_CTES},
    sym AS (
        SELECT d1 AS a, d2 AS b FROM pairs
        UNION
        SELECT d2, d1 FROM pairs
    ),
    reach(id, r) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
    ),
    comp AS (SELECT id AS doc_id, MIN(r) AS representative
             FROM reach GROUP BY id)
    SELECT d.doc_id,
           COALESCE(c.representative, d.doc_id) AS representative
    FROM documents d LEFT JOIN comp c USING (doc_id)
    """,
)
def q68_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-CLUSTER resolution — the step pairwise dedup
    queries (q31/q32) stop short of: near-dup pairs form a graph, and
    "keep one copy" means one representative per CONNECTED COMPONENT
    (pairwise dropping over-deletes on chains A~B~C). Every document maps
    to the min doc_id of its cluster (itself when unpaired);
    ``doc_id == representative`` is the keep filter.

    Spark: large-star/small-star contraction over the verified q32 pair
    list (:func:`~yelp_recommender_spark.operators.cc.connected_components`
    — per-round window-agg + project, lineage truncated by
    localCheckpoint, O(log² n) rounds on ANY graph shape; the one-hop
    min-label propagation variant survives as the parity twin,
    :func:`~yelp_recommender_spark.operators.cc.connected_components_labelprop`).
    Oracle: DuckDB recursive-CTE transitive closure over the same pairs
    — tractable because closure blowup is bounded by cluster size, and
    dedup clusters are small."""
    from yelp_recommender_spark.operators.cc import dedup_representatives

    pairs = minhash_lsh_pairs(
        _doc_shingles(spark, sf_dir), n_hashes=16, bands=8, threshold=0.8
    )
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return dedup_representatives(docs, pairs, id_col="doc_id")


# --------------------------------------------------------------------------
def _duck_simhash_band_keys(bits: int, k: int) -> str:
    """DuckDB twin of :func:`operators.dedup.simhash_band_layout` keys —
    generated from the SAME layout helper so the banding can never
    drift between engine and oracle."""
    from yelp_recommender_spark.operators.dedup import simhash_band_layout

    keys = ", ".join(
        f"CAST({j} AS STRING) || '#' ||"
        f" CAST((simhash >> {off}) & {(1 << w) - 1} AS STRING)"
        for j, (off, w) in enumerate(simhash_band_layout(bits, k))
    )
    return f"[{keys}]"


@query(
    "q69_simhash_hamming_pairs",
    oracle=f"""
    WITH {_duck_simhash_ctes(63)},
    keyed AS (
        SELECT doc_id, simhash,
               unnest({_duck_simhash_band_keys(63, 2)}) AS bk
        FROM sh63
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                        a.simhash AS s1, b.simhash AS s2
        FROM keyed a JOIN keyed b ON a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(s1, s2)) <= 2
    """,
)
def q69_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS within hamming distance 2 — the pair
    generator for the SimHash family (q33 emits per-doc hashes), exact by
    the pigeonhole band guarantee (k+1 = 3 bit-bands: ≤ 2 differing bits
    ⇒ ≥ 1 band agrees, so the band equi-join misses nothing;
    :func:`~yelp_recommender_spark.operators.dedup.simhash_hamming_pairs`).
    63 bits here — the widest positive-BIGINT width, matching production
    64-bit SimHash up to the sign bit (16 is far too coarse for pair
    generation: at hamming ≤ 2 it admits ~15% of ALL pairs on this
    corpus) — and the oracle still replays every bit."""
    from yelp_recommender_spark.operators.dedup import (
        simhash_bits,
        simhash_hamming_pairs,
    )
    from yelp_recommender_spark.queries.text import _docs_tokens

    toks = _docs_tokens(spark, sf_dir)
    hashes = toks.withColumn("dt", F.array_distinct("toks")).select(
        "doc_id", simhash_bits("dt", 63).alias("simhash")
    )
    return simhash_hamming_pairs(hashes, bits=63, k=2)


# --------------------------------------------------------------------------
@query(
    "q70_dedup_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    shs AS (SELECT doc_id, {DUCK_SHINGLES3} AS sh FROM t WHERE len(toks) >= 3),
    sigs AS (SELECT doc_id, sh, {DUCK_MINHASH16} AS sig FROM shs),
    bands AS (SELECT doc_id, unnest({DUCK_BANDS8}) AS bk FROM sigs),
    bb AS (SELECT * FROM bands WHERE doc_id % 10 >= 8),
    partners AS (
        SELECT doc_id, bk, TRUE AS corp FROM bands WHERE doc_id % 10 < 8
        UNION ALL
        SELECT doc_id, bk, FALSE FROM bb
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, p.doc_id AS d2
        FROM bb a JOIN partners p
          ON a.bk = p.bk AND (p.corp OR p.doc_id < a.doc_id)
    ),
    verified AS (
        SELECT d1, d2,
               ROUND(len(list_intersect(x.sh, y.sh))
                     / (len(x.sh) + len(y.sh)
                        - len(list_intersect(x.sh, y.sh))), 6) AS jaccard
        FROM cand
        JOIN shs x ON d1 = x.doc_id
        JOIN shs y ON d2 = y.doc_id
        WHERE jaccard >= 0.8
    )
    SELECT d1 AS doc_id, d2 AS dup_of, jaccard
    FROM verified
    QUALIFY ROW_NUMBER() OVER (PARTITION BY d1
                               ORDER BY jaccard DESC, d2) = 1
    """,
)
def q70_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production ingest shape: treat documents
    with ``doc_id % 10 >= 8`` as today's BATCH and the rest as the
    standing CORPUS; reject batch docs that duplicate (jaccard ≥ 0.8) a
    corpus doc or an earlier batch doc, reporting the best-matching
    partner (max jaccard, ties → min id). The corpus band-key table is
    the persistent dedup index an ingest pipeline appends to each cycle —
    per-cycle work is batch × index, never corpus × corpus
    (:func:`~yelp_recommender_spark.operators.dedup.incremental_minhash_dedup`)."""
    from yelp_recommender_spark.operators.dedup import incremental_minhash_dedup

    sh = _doc_shingles(spark, sf_dir)
    batch = sh.filter(F.col("doc_id") % 10 >= 8)
    corpus = sh.filter(F.col("doc_id") % 10 < 8)
    return incremental_minhash_dedup(
        batch, corpus, n_hashes=16, bands=8, threshold=0.8
    )


# --------------------------------------------------------------------------
@query(
    "q88_hashed_vector_neardup",
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
    ),
    vec AS (
        SELECT doc_id, dim, CAST(SUM(wgt) AS DOUBLE) AS weight
        FROM w GROUP BY doc_id, dim
    ),
    norm AS (
        SELECT doc_id, sqrt(SUM(weight * weight)) AS nrm FROM vec
        GROUP BY doc_id
    ),
    dot AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               SUM(a.weight * b.weight) AS d
        FROM vec a JOIN vec b
          ON a.dim = b.dim AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id1, id2,
           ROUND(d / (na.nrm * nb.nrm), 6) AS cos
    FROM dot
    JOIN norm na ON na.doc_id = id1
    JOIN norm nb ON nb.doc_id = id2
    WHERE na.nrm > 0 AND nb.nrm > 0
      AND ROUND(d / (na.nrm * nb.nrm), 6) >= 0.5
    """,
)
def q88_hashed_vector_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text near-duplicate pairs through the feature-hashing bridge:
    documents → signed-hash TF-IDF vectors (q87's long form, densified)
    → exact cosine pairs at 0.5 — semantic-ish near-dup detection with
    no trained model and no vocabulary state, end to end.

    The oracle replays the ENTIRE chain in SQL — including the dense
    cosine as a sparse dim-join dot product — so this gates the ANN
    broadcast-matmul kernel itself against a pure-SQL twin on real text
    vectors (the q34 gate runs it only on the synthetic embeddings
    table). The engine rounds the UNWEIGHTED long-form weights at 6
    digits first (q87's contract); here weights stay raw so the cosine
    matches the float64 matmul bit-for-bit at 6-digit rounding.

    Scale: vectorization is hash-agg algebra; the pair scan goes through
    the all-pairs planner (``cosine_pairs_above_auto``) — exact
    broadcast-matmul at every tested scale (≤ the 100k all-pairs limit,
    so the oracle gate stays bit-exact), SRP-LSH with derived ≥0.95
    recall beyond it, where the quadratic exact scan turns infeasible."""
    from yelp_recommender_spark.operators.ann import cosine_pairs_above_auto
    from yelp_recommender_spark.operators.tfidf import tfidf
    from yelp_recommender_spark.operators.vectorizer import (
        assemble_embeddings,
        hashed_dim,
        hashed_sign,
    )
    from yelp_recommender_spark.queries.text import _docs_tokens

    d = _docs_tokens(spark, sf_dir)
    tokens_long = d.select("doc_id", F.explode("toks").alias("token"))
    scored = tfidf(
        tokens_long, n_docs=d.agg(F.count(F.lit(1)))
    )
    long_form = (
        scored.select(
            "doc_id",
            hashed_dim("token", 64).alias("dim"),
            (hashed_sign("token") * F.col("tfidf")).alias("_w"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("_w").alias("weight"))
    )
    from yelp_recommender_spark.cache import register_persist

    # pinned: the all-pairs planner consumes vecs THREE times — the
    # tier-decision count, the broadcast-index collect, and the
    # query-side scan — and each raw reference re-ran the whole
    # TF-IDF + signed-hash + assemble chain (two aggregates + two joins
    # over the exploded token stream). One materialization (n_docs × 65
    # doubles) feeds all three; released at the pipeline boundary.
    vecs = register_persist(
        assemble_embeddings(long_form, n_dims=64).withColumnRenamed(
            "doc_id", "vec_id"
        )
    )
    return cosine_pairs_above_auto(vecs, threshold=0.5).orderBy("id1", "id2")
