"""Third-decade scale spots (VERDICT r9 ask #6): the two worst
second-decade exponents — the sketch builds (10.7×, pinned at the
four-scan floor) and q88's output-bound near-dup — plus the composed
curate pipeline, each measured ONE decade beyond the standing sf1
sweep, to catch any super-linear term the first two decades hide.

Opt-in (``SPARK_GRAFT_SWEEP_SF10=1``): the document decade amplifies
sf0.1 × 100 (documents only — all three measurements read nothing
else) into ``scale_data/sf10docs`` (~500k docs), and the composed
pipeline extends the r5 synthetic series (20k → 200k) to 2M generated
docs. min-of-1 by design (the VERDICT's protocol for these spots) with
the sweep-standard stall re-measure on a trip; BASELINE.md records the
measured ratios.

Tier note baked into the q88 measurement: at 500k docs the all-pairs
planner routes the pair scan to the SRP-LSH tier (the exact
broadcast-matmul tier is capped at 100k rows — a 500k² matmul is the
quadratic this engine exists to refuse), so the third decade measures
the PRODUCTION path, not an extrapolated exact scan.
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


@_OPT_IN
def test_q88_third_decade(spark):  # noqa: F811
    """50k → 500k docs through the full q88 chain (tokens → hashed
    TF-IDF vectors → near-dup pairs at 0.5). The amplified copies are
    token-disjoint, so true pair output grows ~linearly in copies; the
    pair scan routes exact-matmul at 50k and SRP-LSH at 500k — the
    router's production behavior IS the thing under measurement."""
    from yelp_recommender_spark.cache import clear_caches
    from yelp_recommender_spark.queries import QUERIES

    sf1, sf10 = _sf_dirs()

    def run(d: str) -> float:
        clear_caches()
        start = time.perf_counter()
        QUERIES["q88_hashed_vector_neardup"](spark, d).count()
        elapsed = time.perf_counter() - start
        clear_caches()
        return elapsed

    run("/root/testdata/sf0.1")  # warm-up
    small, big, ratio = _ratio(run, sf1, sf10)
    print(f"q88 third decade: {small}s -> {big}s ({ratio}x)")
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
