"""Measured-growth gates for the round-8 LLM-pipeline operators
(semantic dedup, repeated-span stripping, learned quality scoring,
DSIR importance resampling, the mergeable-sketch builds) — the same
measured-not-asserted treatment as `test_scale_sweep.py`.

First decade (sf0.01 → sf0.1) runs in the default suite; the second
decade (sf0.1 → amplified sf1) joins the opt-in
``SPARK_GRAFT_SWEEP_SF1=1`` harness. Documents grow 10× per decade;
the stock embeddings table grows 4× on the first decade (500 → 2000)
and 10× on the second (2000 → 20000) — bounds are set per input so a
quadratic blowup still trips them (semdedup is run with the documented
K ∝ n sizing rule, which is exactly what makes it linear; a fixed-K run
would be the quadratic mistake the rule exists to prevent)."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)

FLOOR_S = 0.5


def _docs_tokens(spark, sf_dir):  # noqa: F811
    from yelp_recommender_spark.functions.text import tokens_col

    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", tokens_col("text").alias("toks"))
    )


def _embeddings(spark, sf_dir):  # noqa: F811
    return spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", F.col("embedding").cast("array<double>"))


def _run_all(spark, sf_dir):  # noqa: F811
    """(spans_s, quality_s, semdedup_s, dsir_s, sketch_s) one timed
    pass at sf_dir."""
    from yelp_recommender_spark.operators.dsir import (
        dsir_fit,
        dsir_resample,
        dsir_score,
    )
    from yelp_recommender_spark.operators.qualityclf import score_quality
    from yelp_recommender_spark.operators.semdedup import semantic_dedup
    from yelp_recommender_spark.operators.sketch import (
        cms_state,
        hist_state,
        hll_state,
        mg_state,
    )
    from yelp_recommender_spark.operators.spans import (
        repeated_window_spans,
    )

    docs = _docs_tokens(spark, sf_dir)

    start = time.perf_counter()
    repeated_window_spans(docs, w=8, min_docs=2).count()
    t_spans = time.perf_counter() - start

    rng = np.random.default_rng(7)
    weights = rng.normal(0, 1, 512)
    tokens = docs.select("doc_id", F.explode("toks").alias("token"))
    start = time.perf_counter()
    score_quality(tokens, weights, 0.0, n_dims=512).count()
    t_quality = time.perf_counter() - start

    emb = _embeddings(spark, sf_dir)
    n = emb.count()
    # the documented sizing rule: K ~ n / target_cluster_rows keeps the
    # per-cluster quadratic term constant as the corpus grows
    k = max(4, n // 256)
    start = time.perf_counter()
    semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding",
        n_clusters=k, eps=0.07, sample_n=4096,
    ).count()
    t_sem = time.perf_counter() - start

    # DSIR fit + score + Gumbel-top-k resample against a FIXED target
    # (sf0.001 docs): the raw/scored side is what grows per decade —
    # fit is one hash-agg per side, scoring a broadcast join
    target = _docs_tokens(spark, "/root/testdata/sf0.001")
    n_docs = docs.count()
    start = time.perf_counter()
    w = dsir_fit(target, docs, dim=4096)
    dsir_resample(
        dsir_score(docs, w), max(1, n_docs // 10), seed=0
    ).count()
    t_dsir = time.perf_counter() - start

    # the r8 mergeable-sketch family built over the exploded token
    # stream (the heaviest realistic feed): each is one scan with
    # map-side partials to bounded state
    start = time.perf_counter()
    hll_state(tokens, [], ["token"]).count()
    cms_state(tokens, "token", depth=5, width=2048).count()
    mg_state(tokens, [], "token", k=64).count()
    hist_state(
        docs.select(F.size("toks").cast("double").alias("v")), [], "v"
    ).count()
    t_sketch = time.perf_counter() - start
    return t_spans, t_quality, t_sem, t_dsir, t_sketch


def _gate(small, big, bounds):
    ratios = {}
    failures = []
    for name, t_s, t_b, bound in (
        ("spans", small[0], big[0], bounds[0]),
        ("qualityclf", small[1], big[1], bounds[1]),
        ("semdedup", small[2], big[2], bounds[2]),
        ("dsir", small[3], big[3], bounds[3]),
        ("sketches", small[4], big[4], bounds[4]),
    ):
        r = t_b / max(t_s, FLOOR_S)
        ratios[name] = (round(t_s, 2), round(t_b, 2), round(r, 1))
        if r >= bound:
            failures.append(f"{name}: ratio {r:.1f} >= {bound}")
    print("r8 operator growth ratios:", ratios)
    return failures


def test_r8_operators_grow_linearish_first_decade(spark):  # noqa: F811
    # JVM + Python-worker warm-up, same move as the main sweep
    _docs_tokens(spark, "/root/testdata/sf0.001").count()
    ncpu = spark.sparkContext.defaultParallelism
    spark.range(0, ncpu, 1, ncpu).mapInPandas(
        lambda it: it, "id long"
    ).count()
    small = _run_all(spark, "/root/testdata/sf0.01")
    big = _run_all(spark, "/root/testdata/sf0.1")
    # docs 10x (linear ~10, quadratic ~100); embeddings 4x with K ~ n
    # (linear ~4, fixed-K quadratic ~16)
    failures = _gate(small, big, (25.0, 25.0, 12.0, 25.0, 25.0))
    if failures:  # stall re-measure: min-of-2, same rationale as bench
        small = tuple(
            map(min, small, _run_all(spark, "/root/testdata/sf0.01"))
        )
        big = tuple(map(min, big, _run_all(spark, "/root/testdata/sf0.1")))
        failures = _gate(small, big, (25.0, 25.0, 12.0, 25.0, 25.0))
    assert not failures, "superlinear growth:\n" + "\n".join(failures)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF1"),
    reason="second-decade sweep is opt-in (amplifies ~170 MB, runs "
    "minutes); set SPARK_GRAFT_SWEEP_SF1=1",
)
def test_r8_operators_second_decade(spark):  # noqa: F811
    from yelp_recommender_spark.amplify import amplify

    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scale_data", "sf1"),
    )
    amplify("/root/testdata/sf0.1", sf1_dir, 10)  # idempotent via manifest
    _docs_tokens(spark, "/root/testdata/sf0.01").count()  # warm-up
    small = _run_all(spark, "/root/testdata/sf0.1")
    big = _run_all(spark, sf1_dir)
    failures = _gate(small, big, (25.0, 25.0, 25.0, 25.0, 25.0))  # 10x on all inputs
    if failures:
        small = tuple(
            map(min, small, _run_all(spark, "/root/testdata/sf0.1"))
        )
        big = tuple(map(min, big, _run_all(spark, sf1_dir)))
        failures = _gate(small, big, (25.0, 25.0, 25.0, 25.0, 25.0))
    assert not failures, "superlinear growth:\n" + "\n".join(failures)
