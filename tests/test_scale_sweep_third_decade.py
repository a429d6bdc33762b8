"""Third-decade scale spots (VERDICT r9 ask #6): the two worst
second-decade exponents — the sketch builds (10.7×, pinned at the
four-scan floor) and q88's output-bound near-dup — plus the composed
curate pipeline, each measured ONE decade beyond the standing sf1
sweep, to catch any super-linear term the first two decades hide.

Opt-in (``SPARK_GRAFT_SWEEP_SF10=1``): the document decade amplifies
sf0.1 × 100 (documents only — these measurements read nothing else)
into ``scale_data/sf10docs`` (~500k docs), and the composed pipeline
extends the r5 synthetic series (20k → 200k) to 2M generated docs.
min-of-1 by design (the VERDICT's protocol for these spots) with the
sweep-standard stall re-measure on a trip; BASELINE.md records the
measured ratios.

What the first q88 attempt found (the sweep's whole purpose): at 500k
docs the router leaves the capped exact tier for SRP-LSH, and q88's
catalog threshold (0.5, recall 0.95) derives (7 planes, 50 tables) —
a candidate join over 32% of ALL pairs, ~4·10¹⁰ rows. That leg ground
for an hour inside the candidate shuffle before being killed. The
response is the candidate guard (``srp_candidate_estimate``): the q88
leg now asserts the pre-shuffle REFUSAL at the catalog threshold and
measures the decade ratio in the LSH tier's production regime (a
selective near-dup threshold), where the guard clears it.
"""

from __future__ import annotations

import os
import time

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

MAX_GROWTH = 25.0  # 10× rows; the sweep-wide linear-ish gate
FLOOR_S = 0.5

_OPT_IN = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF10"),
    reason="third-decade sweep is opt-in (amplifies ~500k docs, runs "
    "tens of minutes); set SPARK_GRAFT_SWEEP_SF10=1",
)


def _sf_dirs() -> tuple[str, str]:
    """(sf1 full dir, sf10 documents-only dir), amplified on first use
    (idempotent manifests)."""
    from yelp_recommender_spark.amplify import amplify

    root = os.path.join(os.path.dirname(__file__), "..", "scale_data")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(root, "sf1"))
    sf10 = os.environ.get(
        "SPARK_GRAFT_SF10_DIR", os.path.join(root, "sf10docs")
    )
    amplify("/root/testdata/sf0.1", sf1, 10)
    amplify("/root/testdata/sf0.1", sf10, 100, tables=["documents"])
    return sf1, sf10


def _ratio(fn, small_arg, big_arg) -> tuple[float, float, float]:
    """min-of-1 with the sweep-standard stall re-measure on a trip."""
    small, big = fn(small_arg), fn(big_arg)
    ratio = big / max(small, FLOOR_S)
    if ratio >= MAX_GROWTH:
        small = min(small, fn(small_arg))
        big = min(big, fn(big_arg))
        ratio = big / max(small, FLOOR_S)
    return round(small, 2), round(big, 2), round(ratio, 1)


@_OPT_IN
def test_sketch_builds_third_decade(spark):  # noqa: F811
    """50k → 500k docs: all five mergeable-sketch builds (the
    test_sketch._sketch_pass battery — HLL/CMS/KMV/hist/MG over the
    exploded token stream). Decade 2 sat at 10.7× = the four-scan
    floor; a third decade near 10× confirms no hidden super-linear
    term in the hash-agg states."""
    from tests.test_sketch import _sketch_pass

    sf1, sf10 = _sf_dirs()
    _sketch_pass(spark, "/root/testdata/sf0.1")  # JVM/token warm-up
    small, big, ratio = _ratio(
        lambda d: _sketch_pass(spark, d), sf1, sf10
    )
    print(f"sketch builds third decade: {small}s -> {big}s ({ratio}x)")
    assert ratio < MAX_GROWTH, f"superlinear sketch build growth: {ratio}x"


def _q88_vectors(spark, sf_dir):
    """q88's exact vector chain (tokens → hashed TF-IDF → 64-dim dense),
    reproduced so the pair scan can be driven with explicit knobs."""
    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.tfidf import tfidf
    from yelp_recommender_spark.operators.vectorizer import (
        assemble_embeddings,
        hashed_dim,
        hashed_sign,
    )
    from yelp_recommender_spark.queries.text import _docs_tokens

    d = _docs_tokens(spark, sf_dir)
    tokens_long = d.select("doc_id", F.explode("toks").alias("token"))
    scored = tfidf(tokens_long, n_docs=d.agg(F.count(F.lit(1))))
    long_form = (
        scored.select(
            "doc_id",
            hashed_dim("token", 64).alias("dim"),
            (hashed_sign("token") * F.col("tfidf")).alias("_w"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("_w").alias("weight"))
    )
    return assemble_embeddings(long_form, n_dims=64).withColumnRenamed(
        "doc_id", "vec_id"
    )


@_OPT_IN
def test_q88_unbounded_contract_refused_third_decade(spark):  # noqa: F811
    """The original third-decade finding, pinned: q88's catalog
    operating point (threshold 0.5, recall 0.95) derives SRP params
    (7 planes, 50 tables) whose candidate join touches 32% of ALL
    pairs — ~4·10¹⁰ candidate rows at 500k docs. The first sweep
    attempt GROUND for an hour inside that shuffle; the engine's
    answer is the candidate guard, which names the blowup from
    arithmetic before anything shuffles. This leg asserts the refusal
    (seconds), not the grind (hours)."""
    from yelp_recommender_spark.cache import clear_caches

    _, sf10 = _sf_dirs()
    clear_caches()
    vecs = _q88_vectors(spark, sf10)
    verdict: dict = {}
    with pytest.raises(ValueError, match="candidate join is a multiplier"):
        from yelp_recommender_spark.operators.ann import (
            cosine_pairs_above_auto,
        )

        cosine_pairs_above_auto(
            vecs, threshold=0.5, candidate_guard="raise",
            decision_out=verdict,
        )
    assert verdict["tier"] == "lsh"
    assert verdict["n_rows"] >= 400_000
    assert verdict["est_candidates_per_doc"] > 100_000
    clear_caches()
    print(
        "q88 third decade (threshold 0.5): REFUSED pre-shuffle — "
        f"{verdict['est_candidates']:.2e} est candidates "
        f"({verdict['est_candidates_per_doc']:.0f}/doc) at "
        f"n={verdict['n_rows']}"
    )


@_OPT_IN
def test_q88_selective_third_decade(spark):  # noqa: F811
    """The LSH tier's PRODUCTION regime measured one decade out: the
    same q88 vector chain with a selective near-dup threshold (0.9 →
    derived (16, 35): 0.05% of pairs, ~270 candidates/doc at 500k —
    the guard clears it). 50k routes exact-matmul, 500k routes SRP-LSH;
    the router's tier switch is part of what's measured. The amplified
    copies are token-disjoint, so true pair output stays ~linear in
    copies."""
    from yelp_recommender_spark.cache import clear_caches
    from yelp_recommender_spark.operators.ann import cosine_pairs_above_auto

    sf1, sf10 = _sf_dirs()

    def run(d: str) -> float:
        clear_caches()
        start = time.perf_counter()
        cosine_pairs_above_auto(
            _q88_vectors(spark, d), threshold=0.9
        ).count()
        elapsed = time.perf_counter() - start
        clear_caches()
        return elapsed

    run("/root/testdata/sf0.1")  # warm-up
    small, big, ratio = _ratio(run, sf1, sf10)
    print(
        f"q88 selective (0.9) third decade: {small}s -> {big}s ({ratio}x)"
    )
    assert ratio < MAX_GROWTH, f"superlinear q88 growth: {ratio}x"


@_OPT_IN
def test_curate_pipeline_third_decade(spark, tmp_path):  # noqa: F811
    """The composed pipeline (quality → exact dedup → MinHash LSH
    near-dedup + components → mixture → packing) on the generating
    source, extending the r5 series (20k: 53.6 s, 200k: 357.1 s) one
    decade to 2M docs — same dup_rate, scale as a read option."""
    from yelp_recommender_spark.curate import curate_corpus

    def run(rows: int) -> float:
        out = str(tmp_path / f"curated_{rows}")
        start = time.perf_counter()
        report = curate_corpus(
            spark,
            f"synthetic:rows={rows},partitions=32,dup_rate=0.05",
            out,
            seq_len=256,
        )
        elapsed = time.perf_counter() - start
        assert report["n_input"] == rows
        assert 0 < report["n_curated"] <= rows
        return elapsed

    small, big, ratio = _ratio(run, 200_000, 2_000_000)
    print(f"curate pipeline third decade: {small}s -> {big}s ({ratio}x)")
    assert ratio < MAX_GROWTH, f"superlinear pipeline growth: {ratio}x"
