"""Scale-sweep regression gate (VERDICT r4 #4): the five structurally
expensive operators must grow ≲ linearly with data size — measured, not
argued from plan inspection. Each is timed at sf0.01 and sf0.1 (10× the
rows) in one harness; the wall-clock growth ratio must stay under a
generous linear-ish bound that tolerates CI contention but catches a
quadratic blowup (10× data quadratic → ~100× time ≫ the bound).

Caches are cleared between runs so shared intermediates (token/shingle
tables) can't flatter a later query, and the denominator is floored so
fixed per-job overhead at the small scale can't inflate the ratio.

A second decade (sf0.1 → amplified sf1-equivalent, via
``yelp_recommender_spark.amplify``) is measured by the opt-in
``SPARK_GRAFT_SWEEP_SF1=1`` test below — it amplifies on first use
(idempotent manifest) and takes minutes, so it stays out of the default
suite; BASELINE.md records its measured ratios."""

from __future__ import annotations

import os
import time

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

SWEEP_QUERIES = [
    "q31_ngram_jaccard_pairs",
    "q43_ann_ivf_recall",
    "q66_range_join",
    "q70_dedup_incremental",
    "q109_pagerank",
    # r5 additions: the two heaviest stall-free catalog entries not yet
    # swept — iterative closure (frontier dedup bounds the join fan-out)
    # and LSH-bucketed near-dup over hashed text vectors
    "q117_hierarchy_closure",
    "q88_hashed_vector_neardup",
]
MAX_GROWTH = 25.0  # 10× rows; linear ≈ 10× minus fixed overhead
FLOOR_S = 0.5  # damp job-overhead-dominated small-scale timings


def _timed(spark, name: str, sf_dir: str) -> float:  # noqa: F811
    from yelp_recommender_spark.cache import clear_caches
    from yelp_recommender_spark.queries import QUERIES

    clear_caches()
    start = time.perf_counter()
    QUERIES[name](spark, sf_dir).count()
    elapsed = time.perf_counter() - start
    clear_caches()
    return elapsed


def test_expensive_operators_grow_linearish(spark):  # noqa: F811
    from yelp_recommender_spark.queries import QUERIES

    # warm the JVM + Python worker pool once (same move as bench.py) so
    # the first timed query doesn't pay daemon spawn + imports
    QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.01").count()
    ncpu = spark.sparkContext.defaultParallelism
    spark.range(0, ncpu, 1, ncpu).mapInPandas(lambda it: it, "id long").count()

    failures = []
    for name in SWEEP_QUERIES:
        t_small = _timed(spark, name, "/root/testdata/sf0.01")
        t_big = _timed(spark, name, "/root/testdata/sf0.1")
        ratio = t_big / max(t_small, FLOOR_S)
        if ratio >= MAX_GROWTH:
            # This host shows transient multi-second stalls that migrate
            # between queries run-to-run (BASELINE.md, post-reboot note:
            # e.g. 1.2 s ↔ 17.8 s with zero code change). A genuine
            # quadratic blowup reproduces; a stall doesn't — re-measure
            # both scales once and judge on the per-scale MINIMUM, the
            # same min-of-N rationale as bench.py's repeat mode.
            t_small = min(t_small, _timed(spark, name, "/root/testdata/sf0.01"))
            t_big = min(t_big, _timed(spark, name, "/root/testdata/sf0.1"))
            ratio = t_big / max(t_small, FLOOR_S)
        if ratio >= MAX_GROWTH:
            failures.append(
                f"{name}: {t_small:.2f}s @sf0.01 -> {t_big:.2f}s @sf0.1 "
                f"(ratio {ratio:.1f} >= {MAX_GROWTH})"
            )
    assert not failures, "superlinear growth detected:\n" + "\n".join(failures)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF1"),
    reason="second-decade sweep is opt-in (amplifies ~170 MB, runs minutes); "
    "set SPARK_GRAFT_SWEEP_SF1=1",
)
def test_expensive_operators_grow_linearish_second_decade(spark):  # noqa: F811
    """sf0.1 → amplified sf1-equivalent (10× again): the same operators,
    the same bound, one decade further out — so 'the plans scale' is a
    TWO-decade measured exponent, not an extrapolation from 17 MB."""
    from yelp_recommender_spark.amplify import amplify
    from yelp_recommender_spark.queries import QUERIES

    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", os.path.join(os.path.dirname(__file__), "..", "scale_data", "sf1")
    )
    amplify("/root/testdata/sf0.1", sf1_dir, 10)  # idempotent via manifest

    QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.1").count()
    ncpu = spark.sparkContext.defaultParallelism
    spark.range(0, ncpu, 1, ncpu).mapInPandas(lambda it: it, "id long").count()

    failures = []
    ratios = {}
    for name in SWEEP_QUERIES:
        t_small = _timed(spark, name, "/root/testdata/sf0.1")
        t_big = _timed(spark, name, sf1_dir)
        ratio = t_big / max(t_small, FLOOR_S)
        if ratio >= MAX_GROWTH:  # stall re-measure, same rationale as above
            t_small = min(t_small, _timed(spark, name, "/root/testdata/sf0.1"))
            t_big = min(t_big, _timed(spark, name, sf1_dir))
            ratio = t_big / max(t_small, FLOOR_S)
        ratios[name] = (round(t_small, 2), round(t_big, 2), round(ratio, 1))
        if ratio >= MAX_GROWTH:
            failures.append(
                f"{name}: {t_small:.2f}s @sf0.1 -> {t_big:.2f}s @sf1 "
                f"(ratio {ratio:.1f} >= {MAX_GROWTH})"
            )
    print("second-decade ratios:", ratios)
    assert not failures, "superlinear growth detected:\n" + "\n".join(failures)
