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


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF1"),
    reason="second-decade sweep is opt-in (amplifies ~170 MB, runs minutes); "
    "set SPARK_GRAFT_SWEEP_SF1=1",
)
def test_embedding_ingest_loop_second_decade(spark, tmp_path):  # noqa: F811
    """VERDICT r7 #5: the embedding ingest loop's measured-growth
    treatment, mirroring the MinHash loop's (q70 above). One ingest
    cycle = an odd-id batch deduped against the even-id standing corpus
    — on BOTH tiers: the exact broadcast kernel (its O(batch) output
    claim) and the indexed LSH tier probing PERSISTED corpus buckets
    (batch-keys × index-keys, the production run-N+1 shape; building
    the index is untimed, exactly as in production where it already
    exists). sf0.1 → amplified sf1 is 10× rows on both sides of the
    join; the bound is the sweep-wide linear-ish gate."""
    import pyspark.sql.functions as F

    from yelp_recommender_spark.amplify import amplify
    from yelp_recommender_spark.operators.ann import (
        embedding_incremental_dedup_exact,
        embedding_incremental_dedup_indexed,
        srp_bucket_assignments,
        srp_params_for_recall,
    )

    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scale_data", "sf1"),
    )
    amplify("/root/testdata/sf0.1", sf1_dir, 10)  # idempotent via manifest

    threshold = 0.9
    n_planes, n_tables = srp_params_for_recall(threshold, 0.95)

    def cycle(sf_dir: str, tag: str) -> tuple[float, float]:
        emb = (
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .select("vec_id", F.col("embedding").cast("array<double>"))
        )
        corpus = emb.filter(F.col("vec_id") % 2 == 0)
        batch = emb.filter(F.col("vec_id") % 2 == 1)
        dim = len(corpus.select("embedding").head()[0])
        # the standing index: persisted vectors + bucket keys (UNTIMED —
        # production reads them, it never rebuilds them per cycle)
        vec_p = str(tmp_path / f"vec_{tag}")
        bk_p = str(tmp_path / f"bk_{tag}")
        corpus.write.parquet(vec_p)
        srp_bucket_assignments(
            corpus, "vec_id", "embedding",
            n_planes=n_planes, dim=dim, n_tables=n_tables, seed=42,
        ).select(F.col("vec_id").alias("doc_id"), "bucket").write.parquet(
            bk_p
        )
        idx_vec = spark.read.parquet(vec_p)
        idx_bk = spark.read.parquet(bk_p)

        start = time.perf_counter()
        embedding_incremental_dedup_exact(
            batch, idx_vec, "vec_id", "embedding", threshold
        ).count()
        t_exact = time.perf_counter() - start

        start = time.perf_counter()
        embedding_incremental_dedup_indexed(
            batch, idx_vec, idx_bk,
            n_planes=n_planes, n_tables=n_tables, seed=42,
            id_col="vec_id", vec_col="embedding", threshold=threshold,
        ).count()
        t_indexed = time.perf_counter() - start
        return t_exact, t_indexed

    cycle("/root/testdata/sf0.1", "warm")  # JVM/Arrow warm-up, untimed
    ex_small, ix_small = cycle("/root/testdata/sf0.1", "small")
    ex_big, ix_big = cycle(sf1_dir, "big")
    ratios = {
        "exact": (round(ex_small, 2), round(ex_big, 2),
                  round(ex_big / max(ex_small, FLOOR_S), 1)),
        "indexed_lsh": (round(ix_small, 2), round(ix_big, 2),
                        round(ix_big / max(ix_small, FLOOR_S), 1)),
    }
    print("embedding ingest loop second-decade ratios:", ratios)
    for tier, (_, _, ratio) in ratios.items():
        assert ratio < MAX_GROWTH, f"{tier}: superlinear ({ratios})"
