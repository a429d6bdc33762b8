"""DSIR importance resampling (`operators/dsir.py`): weight-table and
score parity against a numpy model of the published recipe (sharing
only Spark's xxhash64 as the bucket primitive), planted-target
selection, Gumbel-top-k determinism/layout-independence, and the
broadcast plan shape of the scoring path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F811, F401 (fixture)

DIM = 64
ALPHA = 1.0


def _docs(spark, rows):  # noqa: F811
    # rows: [(id, [tok, ...]), ...]
    return spark.createDataFrame(
        rows, "doc_id long, toks array<string>"
    )


def _grams(toks):
    return list(toks) + [
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    ]


def _bucket_map(spark, grams):  # noqa: F811
    """gram → bucket, using Spark's own xxhash64 as the only shared
    primitive between model and engine."""
    rows = spark.createDataFrame(
        [(g,) for g in sorted(set(grams))], "gram string"
    ).select(
        "gram", F.pmod(F.xxhash64("gram"), F.lit(DIM)).alias("bucket")
    )
    return {r.gram: r.bucket for r in rows.collect()}


TARGET_ROWS = [
    (100, ["protein", "binding", "assay", "protein", "fold"]),
    (101, ["enzyme", "binding", "kinetics", "assay"]),
    (102, ["protein", "fold", "structure", "enzyme"]),
]
RAW_ROWS = [
    (0, ["protein", "binding", "structure", "assay"]),  # target-like
    (1, ["enzyme", "kinetics", "fold", "protein"]),  # target-like
    (2, ["touchdown", "quarterback", "season", "coach"]),
    (3, ["election", "ballot", "senate", "coach"]),
    (4, []),  # zero grams: must score 0.0, not NULL
]


def _numpy_model(spark):  # noqa: F811
    """(weights dict bucket→log_ratio, scores dict id→logw)."""
    tg = [g for _, t in TARGET_ROWS for g in _grams(t)]
    rg = [g for _, t in RAW_ROWS for g in _grams(t)]
    bmap = _bucket_map(spark, tg + rg)
    ct = [0] * DIM
    cr = [0] * DIM
    for g in tg:
        ct[bmap[g]] += 1
    for g in rg:
        cr[bmap[g]] += 1
    nt, nr = sum(ct), sum(cr)
    w = {
        b: math.log((ct[b] + ALPHA) / (nt + ALPHA * DIM))
        - math.log((cr[b] + ALPHA) / (nr + ALPHA * DIM))
        for b in range(DIM)
    }
    scores = {
        i: sum(w[bmap[g]] for g in _grams(t)) for i, t in RAW_ROWS
    }
    return w, scores


def test_fit_and_score_match_numpy_model(spark):  # noqa: F811
    from yelp_recommender_spark.operators.dsir import dsir_fit, dsir_score

    target, raw = _docs(spark, TARGET_ROWS), _docs(spark, RAW_ROWS)
    want_w, want_s = _numpy_model(spark)

    weights = dsir_fit(target, raw, dim=DIM, alpha=ALPHA)
    got_w = {r.bucket: r.log_ratio for r in weights.collect()}
    assert len(got_w) == DIM  # full spine: never-seen buckets included
    for b in range(DIM):
        assert got_w[b] == pytest.approx(want_w[b], abs=1e-12)

    scored = dsir_score(raw, weights)
    got_s = {r.doc_id: r.logw for r in scored.collect()}
    for i in want_s:
        assert got_s[i] == pytest.approx(want_s[i], abs=1e-9)
    assert got_s[4] == 0.0  # empty doc: 0.0, never NULL


def test_select_recovers_planted_target_like_docs(spark):  # noqa: F811
    from yelp_recommender_spark.operators.dsir import dsir_select

    # target speaks vocabulary A; raw is 30 A-like + 70 B-like docs
    voc_a = ["protein", "enzyme", "binding", "assay", "fold", "kinetics"]
    voc_b = ["season", "coach", "ballot", "senate", "quarterback", "goal"]
    target = _docs(
        spark,
        [(1000 + i, [voc_a[(i + j) % 6] for j in range(20)]) for i in range(10)],
    )
    raw = _docs(
        spark,
        [(i, [voc_a[(i * 7 + j) % 6] for j in range(20)]) for i in range(30)]
        + [
            (i, [voc_b[(i * 5 + j) % 6] for j in range(20)])
            for i in range(30, 100)
        ],
    )
    picked = {
        r.doc_id for r in dsir_select(target, raw, k=20, dim=256).collect()
    }
    assert len(picked) == 20
    # the ~20-token log-weight gap dwarfs Gumbel(0,1) noise
    assert len([i for i in picked if i < 30]) >= 18


def test_resample_is_deterministic_and_layout_independent(spark):  # noqa: F811
    from yelp_recommender_spark.operators.dsir import dsir_resample

    scored = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("logw")
    )
    a = {r.doc_id for r in dsir_resample(scored, 10, seed=1).collect()}
    b = {
        r.doc_id
        for r in dsir_resample(scored.repartition(13), 10, seed=1).collect()
    }
    assert a == b  # same seed: same selection under any partitioning
    c = {r.doc_id for r in dsir_resample(scored, 10, seed=2).collect()}
    # flat weights: the selection IS the noise, so a new seed moves it
    assert a != c
    # weights dominate noise: a huge-logw doc is always in
    boosted = scored.withColumn(
        "logw", F.when(F.col("doc_id") == 77, 1e6).otherwise(0.0)
    )
    for seed in (1, 2, 3):
        assert 77 in {
            r.doc_id for r in dsir_resample(boosted, 5, seed=seed).collect()
        }


def test_score_plan_broadcasts_weights_and_empty_weights_raise(spark):  # noqa: F811
    from yelp_recommender_spark.operators.dsir import dsir_fit, dsir_score

    target, raw = _docs(spark, TARGET_ROWS), _docs(spark, RAW_ROWS)
    weights = dsir_fit(target, raw, dim=DIM)
    scored = dsir_score(raw, weights)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the dim-row weight table reaches the gram stream as a broadcast,
    # never by shuffling the (huge at scale) exploded gram side
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="dsir_dim"):
        dsir_score(raw, weights.limit(0))


def test_dsir_grows_linearish_first_decade(spark):  # noqa: F811
    import os
    import time

    from yelp_recommender_spark.functions.text import tokens_col
    from yelp_recommender_spark.operators.dsir import dsir_select

    def one_pass(sf_dir):
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", tokens_col("text").alias("toks"), "source")
        target = docs.filter(F.col("source") == "src0").select(
            "doc_id", "toks"
        )
        raw = docs.select("doc_id", "toks")
        start = time.perf_counter()
        n = dsir_select(target, raw, k=50, dim=10_000).count()
        assert n == 50
        return time.perf_counter() - start

    one_pass("/root/testdata/sf0.001")  # warm-up
    small = one_pass("/root/testdata/sf0.01")
    big = one_pass("/root/testdata/sf0.1")
    ratio = big / max(small, 0.5)
    print(f"dsir growth: {small:.2f}s -> {big:.2f}s ({ratio:.1f}x)")
    if ratio >= 25.0:  # stall re-measure, the bench rationale
        small = min(small, one_pass("/root/testdata/sf0.01"))
        big = min(big, one_pass("/root/testdata/sf0.1"))
        ratio = big / max(small, 0.5)
    assert ratio < 25.0, f"superlinear dsir growth: {ratio:.1f}x"


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_SWEEP_SF1"),
    reason="second-decade sweep is opt-in (amplifies ~170 MB, runs "
    "minutes); set SPARK_GRAFT_SWEEP_SF1=1",
)
def test_dsir_second_decade(spark):  # noqa: F811
    import os
    import time

    from yelp_recommender_spark.amplify import amplify
    from yelp_recommender_spark.functions.text import tokens_col
    from yelp_recommender_spark.operators.dsir import dsir_select

    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scale_data", "sf1"),
    )
    amplify("/root/testdata/sf0.1", sf1_dir, 10)  # idempotent

    def one_pass(sf_dir):
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", tokens_col("text").alias("toks"), "source")
        target = docs.filter(F.col("source") == "src0").select(
            "doc_id", "toks"
        )
        start = time.perf_counter()
        assert dsir_select(
            target, docs.select("doc_id", "toks"), k=50, dim=10_000
        ).count() == 50
        return time.perf_counter() - start

    one_pass("/root/testdata/sf0.01")  # warm-up
    small = one_pass("/root/testdata/sf0.1")
    big = one_pass(sf1_dir)
    ratio = big / max(small, 0.5)
    print(f"second-decade dsir growth: {small:.2f}s -> {big:.2f}s "
          f"({ratio:.1f}x)")
    if ratio >= 25.0:  # stall re-measure, min-of-2
        small = min(small, one_pass("/root/testdata/sf0.1"))
        big = min(big, one_pass(sf1_dir))
        ratio = big / max(small, 0.5)
    assert ratio < 25.0, f"superlinear dsir growth: {ratio:.1f}x"
