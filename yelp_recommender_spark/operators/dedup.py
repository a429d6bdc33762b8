"""Deduplication operators (LLM-data-pipeline surface; generalization of
the reference's MinHash+LSH machinery, ``/root/reference/utils/minhash.py``
+ ``/root/reference/utils/lsh.py`` — reimagined, not ported).

Two hash families are provided:

- **portable** (md5-based): bit-identical in Spark and DuckDB/any ANSI
  engine, used by the oracle-checked queries. MinHash permutation *i* is
  ``min(md5(i || '|' || shingle))`` — the min over lexicographic hex
  strings is a valid uniform min-hash because md5 is uniform on its hex
  representation, and string order = byte order in both engines.
- **fast** (xxhash64-based, Spark-only): same shapes at ~10× less CPU for
  production use (``F.xxhash64`` is a codegen'd JVM intrinsic).

Everything is Column algebra over arrays — per-row expressions, no UDF, no
shuffle until the explicit candidate join. Scale notes on each function.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------------
# shingling
# --------------------------------------------------------------------------
def token_shingles(tokens: Column | str, k: int = 3) -> Column:
    """Distinct k-gram token shingles (array<string>), space-joined.

    Built as a ``zip_with`` chain over k shifted slices — NOT as
    ``transform(sequence(...), i -> element_at(t, i+j))``. The lambda-free
    shape is load-bearing: a lambda body that references an *outer
    expression* (the token array) re-evaluates that expression per array
    element in Spark's interpreted HOF path, and when Catalyst inlines an
    upstream projection (CollapseProject / filter pushdown) the "token
    array" becomes the entire tokenizer pipeline — measured ~156 tokenizer
    evals/doc, 28 s single-threaded at sf0.1. ``zip_with`` lambdas touch
    only their lambda variables, so the token array is evaluated exactly
    k times per row no matter what gets inlined above it.

    Docs with < k tokens yield an empty array (``slice`` with a negative
    length would raise — guarded by the lazily-evaluated ``when``)."""
    t = _c(tokens)
    n = F.size(t)
    m = n - (k - 1)
    grams = F.slice(t, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(t, j + 1, m),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


# --------------------------------------------------------------------------
# MinHash
# --------------------------------------------------------------------------
def _fold_elementwise_min(per_shingle: Column, init: Column) -> Column:
    """Fold an array-of-hash-arrays into the elementwise minimum.

    Single structural reference to the input: the aggregate/zip_with
    lambdas read only lambda variables, so even if Catalyst inlines the
    whole shingle pipeline into ``per_shingle`` it is evaluated once per
    row (see :func:`token_shingles` for why that matters)."""
    return F.aggregate(
        per_shingle,
        init,
        lambda acc, hs: F.zip_with(acc, hs, lambda a, h: F.least(a, h)),
    )


def minhash_signature(shingles: Column | str, n_hashes: int = 16) -> Column:
    """Portable MinHash signature: array of ``n_hashes`` hex-string minima.

    sig[i] = min over shingles of md5(i || '|' || shingle), computed as
    one hash-array per shingle folded into an elementwise min (the
    per-``i`` ``array_min`` formulation re-evaluates the shingle array
    expression ``n_hashes`` times per row when inlined). O(n_hashes ×
    n_shingles) md5 calls per row — per-row CPU only, embarrassingly
    parallel, no shuffle. For large corpora prefer
    :func:`minhash_signature_fast`."""
    sh = _c(shingles)
    seq = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    per = F.transform(
        sh,
        lambda s: F.transform(
            seq, lambda i: F.md5(F.concat(i.cast("string"), F.lit("|"), s))
        ),
    )
    # "~" (0x7e) sorts after every hex digit — identity for the min fold
    return _fold_elementwise_min(per, F.array_repeat(F.lit("~"), n_hashes))


def minhash_signature_fast(shingles: Column | str, n_hashes: int = 64) -> Column:
    """Spark-only MinHash via seeded xxhash64 (array<bigint>): the
    production path — one 64-bit hash per (seed, shingle), JVM intrinsic.
    Same single-reference fold shape as :func:`minhash_signature`."""
    sh = _c(shingles)
    seq = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    per = F.transform(
        sh, lambda s: F.transform(seq, lambda i: F.xxhash64(s, i))
    )
    return _fold_elementwise_min(
        per, F.array_repeat(F.lit(9223372036854775807).cast("bigint"), n_hashes)
    )


def minhash_candidate_prob(
    jaccard: float, bands: int, rows: int
) -> float:
    """P[a pair with the given true Jaccard becomes an LSH candidate]
    under ``bands`` bands of ``rows`` rows: 1 − (1 − j^r)^b — the curve
    the reference tabulates by hand (``/root/reference/utils/lsh.py:7-21``)
    to pick its 256×2 configuration. Use it to size (bands, rows) for a
    target recall at the dedup threshold, the same way
    :func:`~yelp_recommender_spark.operators.ann.srp_params_for_recall`
    does for the cosine family."""
    j = max(0.0, min(1.0, float(jaccard)))
    return 1.0 - (1.0 - j**rows) ** bands


def lsh_band_keys(signature: Column | str, bands: int, rows: int) -> Column:
    """Band keys for LSH bucketing: band j → md5(j || '#' || sig-slice).

    The band index is baked into the key, so a single equality join on the
    key cannot collide across bands. Returns array<string> of length
    ``bands``."""
    sig = _c(signature)
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.md5(
            F.concat(
                j.cast("string"),
                F.lit("#"),
                F.concat_ws("|", F.slice(sig, j * rows + 1, rows)),
            )
        ),
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_bits(tokens_distinct: Column | str, bits: int = 16) -> Column:
    """``bits``-bit SimHash over a distinct-token array, as BIGINT
    (bits ≤ 63 so the value stays a positive BIGINT; md5's 128 hash bits
    bound it well above any useful width).

    Each token's md5 prefix is folded into ONE 63-bit integer
    ``H = hex[1:8] + (hex[9:16] mod 2^31) · 2^32`` and bit j of the
    token is ``(H >> j) & 1`` — integer shift/mask all the way, which
    matters because array HOF lambdas run interpreted (not codegen'd):
    the previous per-bit hex-nibble parse (substring+instr+divide per
    token per bit) made this kernel ~3× slower. The construction is
    portable: DuckDB replays ``H`` via ``('0x' || substr(md5(t),...))
    ::BIGINT`` (see ``queries/dedup._duck_simhash_ctes``).

    Bit j of the SimHash is 1 iff strictly more than half the tokens
    have bit j set (2·hits > n — deterministic tie-break: ties → 0).

    md5 is computed once per token (hash array), then ``bits`` bit-counts
    reuse it. Per-row expression; no shuffle."""
    if not 1 <= bits <= 63:
        raise ValueError(f"bits must be in [1, 63], got {bits}")
    toks = _c(tokens_distinct)
    n = F.size(toks)

    def int_hash(t: Column) -> Column:
        h = F.md5(t)
        lo = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
        hi = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint") % F.lit(
            2**31
        ).cast("bigint")
        return lo + hi * F.lit(2**32).cast("bigint")

    # Single-pass shape: md5→int once per token → per-token bit vector →
    # elementwise-sum fold → weighted majority. Each stage references its
    # input exactly once and lambda bodies touch only lambda variables, so
    # nothing re-evaluates per bit (the naive per-bit ``filter(hashes, ...)``
    # formulation recomputes the md5 array ``bits`` times per row when the
    # interpreted HOF path inlines it — see :func:`token_shingles`).
    hashes = F.transform(toks, int_hash)
    per_token_bits = F.transform(
        hashes,
        lambda H: F.array(
            *[
                F.shiftright(H, j).bitwiseAND(F.lit(1)).cast("int")
                for j in range(bits)
            ]
        ),
    )
    counts = F.aggregate(
        per_token_bits,
        F.array_repeat(F.lit(0), bits),
        lambda acc, bv: F.zip_with(acc, bv, lambda a, b: a + b),
    )
    powers = F.array(*[F.lit(2**j).cast("bigint") for j in range(bits)])
    weighted = F.zip_with(
        counts,
        powers,
        lambda c, p: F.when(2 * c > n, p).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(
        weighted, F.lit(0).cast("bigint"), lambda a, x: a + x
    )


def simhash16(tokens_distinct: Column | str) -> Column:
    """16-bit SimHash (the portable test width; see :func:`simhash_bits`)."""
    return simhash_bits(tokens_distinct, 16)


# --------------------------------------------------------------------------
# pair generation / verification
# --------------------------------------------------------------------------
def jaccard_verify_pairs(
    candidates: DataFrame,
    features: DataFrame,
    id_col: str = "doc_id",
    feat_col: str = "shingles",
    left: str = "d1",
    right: str = "d2",
    threshold: float = 0.8,
) -> DataFrame:
    """Join candidate pairs back to their shingle sets and keep pairs with
    true Jaccard ≥ threshold. Returns (d1, d2, jaccard rounded 6).

    Scale: ``features`` is re-joined twice; at 100 TB both joins shuffle on
    the id — acceptable because candidates ≪ corpus after LSH pruning."""
    f1 = features.select(
        F.col(id_col).alias(left), F.col(feat_col).alias("_s1")
    )
    f2 = features.select(
        F.col(id_col).alias(right), F.col(feat_col).alias("_s2")
    )
    inter = F.size(F.array_intersect("_s1", "_s2"))
    union = F.size("_s1") + F.size("_s2") - inter
    return (
        candidates.join(f1, left)
        .join(f2, right)
        .withColumn(
            "jaccard",
            F.round(
                F.when(union == 0, F.lit(0.0)).otherwise(inter / union), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(left, right, "jaccard")
    )


def blocking_exclusions(
    docs: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    df_cap: int = 500,
) -> DataFrame:
    """How much signal the ``df_cap`` in :func:`blocked_jaccard_pairs`
    drops — the cap's blind spot made measurable instead of silent
    (ADVICE r2 #5). One row:

    - ``hot_shingles``: shingles with document frequency > df_cap,
      excluded from blocking;
    - ``fully_hot_docs``: documents ALL of whose shingles are hot — these
      are invisible to the blocked join (a pair of boilerplate-only docs
      can never be emitted). Non-zero here means raise the cap or route
      those docs through :func:`minhash_lsh_pairs`.

    Scale: two hash-aggs over the exploded postings; the hot list is tiny
    by construction (broadcast anti-join)."""
    ex = docs.select(id_col, F.explode(shingle_col).alias("s"))
    hot = (
        ex.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("s")
    )
    cold_ids = (
        ex.join(F.broadcast(hot), "s", "left_anti").select(id_col).distinct()
    )
    fully_hot = docs.filter(F.size(shingle_col) > 0).join(
        cold_ids, id_col, "left_anti"
    )
    return hot.agg(F.count(F.lit(1)).alias("hot_shingles")).crossJoin(
        fully_hot.agg(F.count(F.lit(1)).alias("fully_hot_docs"))
    )


def blocked_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    threshold: float = 0.8,
    df_cap: int = 500,
    log_exclusions: bool = False,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via shared-shingle blocking —
    no cartesian product (SURVEY §7 risk register: pair-generation blowup).

    Pairs come from a self-equi-join on exploded shingles whose document
    frequency is ≤ ``df_cap`` (standard blocking hygiene: a hot shingle
    contributes freq² join rows, so without the cap a boilerplate corpus
    goes quadratic at 100×; with it the join work is bounded by df_cap ×
    total postings). The hot-shingle list is tiny by construction —
    broadcast anti-join, no extra shuffle of the postings.

    Exactness without re-joining the shingle arrays: the capped join
    yields c_cold = |cold(A) ∩ cold(B)|, and per-doc hot-shingle counts
    h = |shingles| − |cold shingles| bound the unseen overlap:
    c_cold ≤ c_true ≤ c_cold + min(h1, h2). When min(h1, h2) = 0 the
    bound is tight and the Jaccard is computed from integer columns
    alone; only pairs with both-docs-hot ambiguity AND an upper bound
    crossing the threshold are verified against the full arrays — a
    vanishing fraction, so the expensive array-payload join almost never
    runs. Pairs sharing *only* hot shingles are excluded by construction
    (they share nothing distinctive).

    Scale: shuffles on the shingle key (uniform strings) for blocking and
    one hash-agg on the pair key; nothing collects to the driver.

    The cap's blind spot (docs whose entire overlap is hot shingles) is
    measurable via :func:`blocking_exclusions`; with
    ``log_exclusions=True`` the operator runs that small aggregate
    eagerly and warns when any document is fully hot."""
    if log_exclusions:
        row = blocking_exclusions(docs, id_col, shingle_col, df_cap).head()
        if row.fully_hot_docs > 0:
            logger.warning(
                "blocked_jaccard_pairs df_cap=%d: %d hot shingles; "
                "%d documents have ONLY hot shingles and are invisible "
                "to blocking — raise df_cap or use minhash_lsh_pairs",
                df_cap, row.hot_shingles, row.fully_hot_docs,
            )
        else:
            logger.info(
                "blocked_jaccard_pairs df_cap=%d: %d hot shingles "
                "excluded, 0 fully-hot documents",
                df_cap, row.hot_shingles,
            )
    from yelp_recommender_spark.cache import register_persist

    ex = docs.select(id_col, F.explode(shingle_col).alias("s"))
    hot = (
        ex.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("s")
    )
    # Pin the cold postings: the lineage below references cold THREE
    # times (join sides a/b + the per-doc cold counts), and each raw
    # reference re-runs the explode, the full hot-shingle aggregate and
    # the anti-join (the r10 plan audit showed that chain planned 3×,
    # the hot aggregate with it). One materialization feeds all three;
    # released at the pipeline boundary (clear_caches), the
    # _doc_shingles convention.
    cold = register_persist(ex.join(F.broadcast(hot), "s", "left_anti"))
    # per-doc totals and hot counts (h = n − cold postings)
    sizes = docs.select(F.col(id_col), F.size(shingle_col).alias("n"))
    cold_counts = cold.groupBy(id_col).agg(F.count(F.lit(1)).alias("nc"))
    stats = sizes.join(cold_counts, id_col, "left").select(
        id_col, "n", (F.col("n") - F.coalesce("nc", F.lit(0))).alias("h")
    )
    a = cold.alias("a")
    b = cold.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = stats.select(
        F.col(id_col).alias("d1"), F.col("n").alias("n1"), F.col("h").alias("h1")
    )
    s2 = stats.select(
        F.col(id_col).alias("d2"), F.col("n").alias("n2"), F.col("h").alias("h2")
    )
    # no broadcast hint: the per-doc stats table scales with the corpus —
    # AQE picks broadcast when it fits, shuffle-hash otherwise
    scored = common.join(s1, "d1").join(s2, "d2")
    hmin = F.least("h1", "h2")
    c_ub = F.col("c") + hmin
    jac_exact = F.round(F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")), 6)
    jac_ub = c_ub / (F.col("n1") + F.col("n2") - c_ub)
    # ONE pass over the scored pairs — the r9 scan-audit rule applied to
    # this operator's own exact/ambiguous split (the previous
    # exact-UNION-verified form referenced `scored` twice, re-running
    # the pair-generation join + aggregate once per branch). Rows are
    # kept when already-decided (tight bound, above threshold) or when
    # both-docs-hot ambiguity leaves a rounded upper bound crossing the
    # threshold; only the latter pick up their shingle arrays through
    # the conditional joins below for exact verification.
    # (Rounding the upper bound mirrors the oracle: unrounded, a pair
    # with true Jaccard in [threshold−5e-7, threshold) — which
    # ROUND(...,6) admits — could be pre-filtered out here.)
    verify = (hmin > 0) & (F.round(jac_ub, 6) >= threshold)
    flagged = scored.filter(
        ((hmin == 0) & (jac_exact >= threshold)) | verify
    ).withColumn("_verify", verify)
    f1 = docs.select(
        F.col(id_col).alias("_vid1"), F.col(shingle_col).alias("_s1")
    )
    f2 = docs.select(
        F.col(id_col).alias("_vid2"), F.col(shingle_col).alias("_s2")
    )
    j = flagged.join(
        f1, (F.col("d1") == F.col("_vid1")) & F.col("_verify"), "left"
    ).join(f2, (F.col("d2") == F.col("_vid2")) & F.col("_verify"), "left")
    inter = F.size(F.array_intersect("_s1", "_s2"))
    vunion = F.size("_s1") + F.size("_s2") - inter
    # same exact-Jaccard formula as jaccard_verify_pairs, including the
    # empty-union → 0.0 convention
    ver_jac = F.round(
        F.when(vunion == 0, F.lit(0.0)).otherwise(inter / vunion), 6
    )
    return (
        j.withColumn(
            "jaccard",
            F.when(F.col("_verify"), ver_jac).otherwise(jac_exact),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def simhash_band_layout(bits: int, k: int) -> list[tuple[int, int]]:
    """(offset, width) of the ``k + 1`` contiguous bit-bands used by
    :func:`simhash_hamming_pairs` — pigeonhole: two hashes within hamming
    distance k differ in ≤ k bands, so they AGREE on ≥ 1 of k+1 bands.
    Widths are as even as possible (the first ``bits % (k+1)`` bands get
    the extra bit); exposed so oracle SQL can replay the exact layout."""
    n_bands = k + 1
    if n_bands > bits:
        raise ValueError(f"k+1={n_bands} bands need at least {n_bands} bits")
    base, rem = divmod(bits, n_bands)
    layout, off = [], 0
    for j in range(n_bands):
        w = base + (1 if j < rem else 0)
        layout.append((off, w))
        off += w
    return layout


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    bits: int = 16,
    k: int = 2,
) -> DataFrame:
    """All (d1 < d2) pairs whose SimHashes are within hamming distance
    ``k`` — EXACT under the pigeonhole band guarantee (unlike MinHash-LSH
    banding, which is probabilistic): split the ``bits`` into k+1 bands;
    any pair with ≤ k differing bits must match exactly on some band, so
    the band equi-join generates a candidate superset and
    ``bit_count(xor) ≤ k`` verifies. The fourth dedup family's pair
    generator (q33 emits the per-doc hashes; this finds the near-dups).

    Scale: fan-out is k+1 rows per doc; the join shuffles on the band
    key. Band-key skew is data-dependent (a corpus of near-identical docs
    concentrates one bucket) — the df_cap treatment from
    :func:`blocked_jaccard_pairs` applies if that bites; at 64 bits
    (production SimHash) buckets are far sparser than at the portable
    16-bit test width. Verification is a column expression on values
    carried through the join — no second join back to the corpus."""
    layout = simhash_band_layout(bits, k)
    s = _c(sim_col)
    keys = F.array(
        *[
            F.concat(
                F.lit(f"{j}#"),
                F.shiftright(s, off).bitwiseAND(F.lit((1 << w) - 1)).cast("string"),
            )
            for j, (off, w) in enumerate(layout)
        ]
    )
    from yelp_recommender_spark.cache import register_persist

    # pinned: the band self-join below references keyed twice (sides
    # a/b), and each raw reference re-runs the SimHash bit computation
    # and the band explode over the upstream token lineage (the r10
    # plan audit showed the chain planned twice). One materialization —
    # (id, band key, 8-byte hash) × (k+1) rows per doc — feeds both
    # sides; released at the pipeline boundary (clear_caches).
    keyed = register_persist(
        df.select(
            F.col(id_col), F.explode(keys).alias("bk"), s.alias("_sim")
        )
    )
    a = keyed.select(
        F.col(id_col).alias("d1"), F.col("_sim").alias("_s1"), "bk"
    )
    b = keyed.select(
        F.col(id_col).alias("d2"), F.col("_sim").alias("_s2"), "bk"
    )
    return (
        a.join(b, (a.bk == b.bk) & (F.col("d1") < F.col("d2")))
        .withColumn(
            "hamming",
            F.bit_count(F.col("_s1").bitwiseXOR(F.col("_s2"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= k)  # verify BEFORE the pair-dedup
        .select("d1", "d2", "hamming")
        .distinct()  # shuffles only survivors, not the candidate superset
    )


def incremental_minhash_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    fast: bool = False,
) -> DataFrame:
    """Incremental dedup — the production ingest pattern: which BATCH
    documents duplicate the existing CORPUS (or an earlier doc in the
    same batch)? Returns (doc_id, dup_of, jaccard): one row per rejected
    batch doc with its best-matching partner (max jaccard, ties → min
    partner id). Batch docs absent from the result are clean to append.

    Partner set per batch doc: every corpus doc, plus batch docs with a
    SMALLER id (greedy within-batch keep-first — deterministic given ids;
    ids must be disjoint between batch and corpus).

    Scale: corpus signatures/band keys are a map-only pass that an ingest
    pipeline computes ONCE and persists alongside the corpus (the
    signature table IS the dedup index — append the surviving batch's
    signatures each cycle, which is exactly what
    :func:`incremental_minhash_dedup_indexed` + the curate pipeline's
    standing-corpus mode do); per cycle the work is band-join of the
    small batch against the indexed corpus keys, never corpus × corpus."""
    return incremental_minhash_dedup_indexed(
        batch,
        band_key_index(
            corpus, id_col=id_col, shingle_col=shingle_col,
            n_hashes=n_hashes, bands=bands, fast=fast,
        ),
        corpus.select(id_col, shingle_col),
        id_col=id_col,
        shingle_col=shingle_col,
        n_hashes=n_hashes,
        bands=bands,
        threshold=threshold,
        fast=fast,
    )


def band_key_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    n_hashes: int = 16,
    bands: int = 8,
    fast: bool = False,
) -> DataFrame:
    """The persistable LSH dedup index: one (id, band-key) row per band
    per document — the map-only table an ingest pipeline stores alongside
    the corpus and appends each cycle's survivors to. Band keys are
    hash-family-specific: an index must be queried with the SAME
    (n_hashes, bands, fast) it was built with.

    The signature projection is persisted (session cache registry)
    before banding, the same move :func:`minhash_lsh_pairs` documents:
    ``lsh_band_keys`` references the signature once per band inside a
    HOF lambda, and against an INLINED expression (CollapseProject
    merges the projection into the lambda) the full MinHash fold would
    recompute ``bands`` times per row — against the cached attribute
    each band slices a materialized array."""
    from yelp_recommender_spark.cache import register_persist

    rows = n_hashes // bands
    sig_fn = minhash_signature_fast if fast else minhash_signature
    sigs = register_persist(
        docs.select(id_col, sig_fn(shingle_col, n_hashes).alias("_sig"))
    )
    return sigs.select(
        id_col, F.explode(lsh_band_keys("_sig", bands, rows)).alias("bk")
    )


def incremental_minhash_dedup_indexed(
    batch: DataFrame,
    corpus_band_keys: DataFrame,
    corpus_features: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    fast: bool = False,
    batch_band_keys: DataFrame | None = None,
    decision_out: dict | None = None,
    max_candidate_pairs: float | None = None,
) -> DataFrame:
    """:func:`incremental_minhash_dedup` against a PRECOMPUTED corpus
    index: ``corpus_band_keys`` is the persisted (id, bk) table
    (:func:`band_key_index`) and ``corpus_features`` the (id, shingles)
    table used for exact Jaccard verification — the standing-corpus
    production loop where corpus signatures are never recomputed.
    Semantics and output are identical to the non-indexed form.

    ``batch_band_keys`` lets a caller that needs the BATCH's band keys
    for its own purposes (e.g. the curate pipeline appends the
    survivors' keys to the standing index) compute them once and share:
    it must be :func:`band_key_index` over ``batch`` with the same
    (n_hashes, bands, fast) family, and is derived here when omitted.

    ``decision_out`` / ``max_candidate_pairs``: the batch×index band
    join is the one shuffle here that can multiply (a batch of
    near-identical docs probing an index holding their whole duplicate
    family); when either is set, the sketch-backed planner
    (:func:`~yelp_recommender_spark.operators.joinplan.join_plan`)
    estimates the candidate count BEFORE the shuffle — the verdict is
    recorded in ``decision_out``, and an estimate above
    ``max_candidate_pairs`` fails fast with a ``ValueError``. The
    estimate is one-sided HIGH for the real join (its extra
    ``corp | d2 < d1`` predicate only removes rows). Default: zero
    planner cost."""
    from yelp_recommender_spark.operators.topk import top_n_per_key

    bk_batch = (
        batch_band_keys
        if batch_band_keys is not None
        else band_key_index(
            batch, id_col=id_col, shingle_col=shingle_col,
            n_hashes=n_hashes, bands=bands, fast=fast,
        )
    )
    partners = corpus_band_keys.select(id_col, "bk").withColumn(
        "corp", F.lit(True)
    ).unionByName(bk_batch.withColumn("corp", F.lit(False)))
    lhs = bk_batch.select(F.col(id_col).alias("d1"), "bk")
    rhs = partners.select(F.col(id_col).alias("d2"), "bk", "corp")
    if decision_out is not None or max_candidate_pairs is not None:
        from yelp_recommender_spark.operators.joinplan import join_plan

        # broadcast_rows=0 forces the grid estimate: the point of the
        # guard IS the output cardinality, not the physical shape (the
        # join below keeps its non-equi predicate either way)
        verdict = join_plan(lhs, rhs, "bk", broadcast_rows=0)
        verdict["join_form"] = "band_key_batch_x_index"
        if decision_out is not None:
            decision_out.update(verdict)
        if (
            max_candidate_pairs is not None
            and verdict["est_join_rows"] is not None
            and verdict["est_join_rows"] > max_candidate_pairs
        ):
            raise ValueError(
                "incremental-dedup band join over budget: ≥ "
                f"{verdict['est_join_rows']:.0f} candidates estimated "
                f"(cap {max_candidate_pairs:.0f}) for a "
                f"{verdict['n_left']}-key batch against a "
                f"{verdict['n_right']}-key index — the batch probes a "
                "large duplicate family; split the batch or raise the "
                "cap"
            )
    candidates = (
        lhs.join(
            rhs,
            (lhs.bk == rhs.bk)
            & (F.col("corp") | (F.col("d2") < F.col("d1"))),
        )
        .select("d1", "d2")
        .distinct()
    )
    features = corpus_features.select(id_col, shingle_col).unionByName(
        batch.select(id_col, shingle_col)
    )
    verified = jaccard_verify_pairs(
        candidates, features, id_col=id_col,
        feat_col=shingle_col, threshold=threshold,
    )
    return top_n_per_key(
        verified, ["d1"], "jaccard", 1, tiebreak="d2"
    ).select(
        F.col("d1").alias(id_col),
        F.col("d2").alias("dup_of"),
        "jaccard",
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    fast: bool = False,
    decision_out: dict | None = None,
    max_candidate_pairs: float | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with true Jaccard.

    shingles → signature → band keys → explode → self-join on band key →
    distinct candidate pairs → verify. With b bands of r rows the
    candidate-recall curve is 1-(1-j^r)^b (the reference tabulates the
    same trade-off at ``/root/reference/utils/lsh.py:7-21``).

    Scale: the only shuffles are the band-key self-join (keys are md5
    strings — uniformly distributed for DISTINCT signatures) and the
    verify joins on doc id. Nothing collects to the driver. The one
    way this still explodes is a pathological corpus: thousands of
    near-identical documents share band keys, and the candidate join
    multiplies quadratically in the duplicate-cluster size.
    ``decision_out`` (caller dict, updated in place) consults the
    sketch-backed planner
    (:func:`~yelp_recommender_spark.operators.joinplan.self_join_size`
    over the band-key table — one pass over the already-persisted
    signatures, bounded grid state) and records the candidate-pair
    estimate BEFORE the shuffle; ``max_candidate_pairs`` additionally
    makes it a budget — a ``ValueError`` fail-fast when the one-sided
    estimate exceeds it (the cluster-cap pattern: refuse with evidence
    rather than OOM an hour in). Default (both None): zero planner
    cost, byte-identical behavior.

    The signature table is persisted before banding: it is consumed by
    both sides of the self-join, and ``lsh_band_keys`` references the
    signature once per band inside a lambda — against the cached
    attribute that is a cheap slice, whereas against an inlined
    expression it would recompute the MinHash ``bands`` times per row
    (see :func:`token_shingles` on HOF re-evaluation)."""
    from yelp_recommender_spark.cache import register_persist

    rows = n_hashes // bands
    sig_fn = minhash_signature_fast if fast else minhash_signature
    sigs = register_persist(
        docs.select(id_col, sig_fn(shingle_col, n_hashes).alias("_sig"))
    )
    with_keys = sigs.select(
        id_col,
        F.explode(lsh_band_keys("_sig", bands, rows)).alias("bk"),
    )
    if decision_out is not None or max_candidate_pairs is not None:
        from yelp_recommender_spark.operators.joinplan import self_join_size

        verdict = self_join_size(with_keys, "bk")
        if decision_out is not None:
            decision_out.update(verdict)
        if (
            max_candidate_pairs is not None
            and verdict["est_pairs"] > max_candidate_pairs
        ):
            raise ValueError(
                "LSH band-key join over budget: ≥ "
                f"{verdict['est_pairs']:.0f} candidate pairs estimated "
                f"(cap {max_candidate_pairs:.0f}) from "
                f"{verdict['n_rows']} band keys — the corpus has a "
                "duplicate cluster multiplying the join (hottest band "
                f"key ≤ {verdict['max_key_frac']:.2%} of keys); dedup "
                "exact duplicates first or raise the cap"
            )
    lhs = with_keys.select(F.col(id_col).alias("d1"), "bk")
    rhs = with_keys.select(F.col(id_col).alias("d2"), "bk")
    candidates = (
        lhs.join(rhs, (lhs.bk == rhs.bk) & (F.col("d1") < F.col("d2")))
        .select("d1", "d2")
        .distinct()
    )
    return jaccard_verify_pairs(
        candidates,
        docs.select(id_col, shingle_col),
        id_col=id_col,
        feat_col=shingle_col,
        threshold=threshold,
    )
