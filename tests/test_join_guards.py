"""The engine's own explosion-risk joins routed through the
sketch-backed planner (r9 VERDICT ask #1): the CF co-rating self-join
(`models/cf.py corated_weights`) and the LSH band-key joins
(`operators/dedup.py minhash_lsh_pairs` /
`incremental_minhash_dedup_indexed`). Contract under test: a planted
pathological corpus gets the explosion verdict BEFORE the shuffle,
the budget flavor fails fast with evidence, and results are
bit-identical with the guard on, recorded-only, or off."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)

from yelp_recommender_spark.models.cf import corated_weights
from yelp_recommender_spark.operators.dedup import (
    band_key_index,
    incremental_minhash_dedup_indexed,
    minhash_lsh_pairs,
)


def _ratings(spark, whale_users=1, whale_n=60, tail_users=20):
    """One whale context (a user who rated `whale_n` businesses) over a
    sparse tail — the co-rating multiplier shape."""
    rows = []
    for w in range(whale_users):
        rows += [(f"whale{w}", f"b{i}", 3.0 + (i % 3)) for i in range(whale_n)]
    for u in range(tail_users):
        rows += [(f"u{u}", f"b{u % 7}", 4.0), (f"u{u}", f"b{(u + 1) % 7}", 2.0)]
    return spark.createDataFrame(
        rows, "user_id string, business_id string, stars double"
    )


def _collected(df):
    return sorted(tuple(r) for r in df.collect())


def test_corated_whale_flags_explosion_and_results_identical(spark):  # noqa: F811
    ratings = _ratings(spark)
    baseline = _collected(
        corated_weights(ratings, "business_id", "user_id", min_corated=2)
    )
    out: dict = {}
    guarded = corated_weights(
        ratings, "business_id", "user_id", min_corated=2,
        plan_guard=None, decision_out=out,  # record-only planning
    )
    assert out["explosion"] is True  # ~60²/2 pairs from ~100 ratings
    assert out["est_pairs"] >= 60 * 59 / 2
    assert out["max_key_frac"] >= 0.5  # the whale context dominates
    assert out["cap_per_context"] is None
    assert _collected(guarded) == baseline  # planner never changes rows

    with pytest.warns(UserWarning, match="cap_per_context"):
        corated_weights(
            ratings, "business_id", "user_id", min_corated=2,
            plan_guard="warn",
        ).count()
    with pytest.raises(ValueError, match="multiplier"):
        corated_weights(
            ratings, "business_id", "user_id", min_corated=2,
            plan_guard="raise",
        )


def test_corated_cap_is_the_bounded_path(spark):  # noqa: F811
    """cap_per_context prunes the whale BEFORE the plan is taken, so
    the same corpus plans clean — the detect→remedy loop closed in
    plan order (the verdict describes the join as it will run)."""
    ratings = _ratings(spark)
    out: dict = {}
    capped = corated_weights(
        ratings, "business_id", "user_id", min_corated=2,
        cap_per_context=5, plan_guard="raise", decision_out=out,
    )
    assert out["explosion"] is False
    assert out["cap_per_context"] == 5
    capped.count()  # materializes without raising
    # uniform corpus never warns even unguarded by a cap
    flat = spark.createDataFrame(
        [(f"u{i}", f"b{i % 5}", 3.0) for i in range(40)],
        "user_id string, business_id string, stars double",
    )
    out = {}
    corated_weights(
        flat, "business_id", "user_id", plan_guard="raise",
        decision_out=out,
    ).count()
    assert out["explosion"] is False


def _docs(spark, n_dups=40, n_unique=30):
    """A duplicate cluster (identical shingles → identical signatures →
    hot band keys) over a unique tail."""
    rows = [(f"dup{i:03d}", [f"tok{j}" for j in range(12)]) for i in range(n_dups)]
    rows += [
        (f"uni{i:03d}", [f"only{i}_{j}" for j in range(12)])
        for i in range(n_unique)
    ]
    return spark.createDataFrame(rows, "doc_id string, shingles array<string>")


def test_minhash_lsh_pairs_guard(spark):  # noqa: F811
    docs = _docs(spark)
    baseline = _collected(
        minhash_lsh_pairs(docs, n_hashes=16, bands=8, threshold=0.8)
    )
    out: dict = {}
    got = minhash_lsh_pairs(
        docs, n_hashes=16, bands=8, threshold=0.8, decision_out=out
    )
    # 40 identical docs × 8 bands: ≥ 8·40·39/2 candidate key pairs
    assert out["explosion"] is True
    assert out["est_pairs"] >= 8 * 40 * 39 / 2
    assert _collected(got) == baseline
    with pytest.raises(ValueError, match="over budget"):
        minhash_lsh_pairs(
            docs, n_hashes=16, bands=8, threshold=0.8,
            max_candidate_pairs=100,
        )
    # a generous budget passes through untouched
    ok = minhash_lsh_pairs(
        docs, n_hashes=16, bands=8, threshold=0.8,
        max_candidate_pairs=1e9,
    )
    assert _collected(ok) == baseline


def test_incremental_indexed_guard(spark):  # noqa: F811
    corpus = _docs(spark, n_dups=40, n_unique=10)
    batch = spark.createDataFrame(
        [(f"zz{i:02d}", [f"tok{j}" for j in range(12)]) for i in range(6)],
        "doc_id string, shingles array<string>",
    )  # every batch doc probes the whole 40-doc duplicate family
    idx = band_key_index(corpus, n_hashes=16, bands=8)
    feats = corpus.select("doc_id", "shingles")
    baseline = _collected(
        incremental_minhash_dedup_indexed(
            batch, idx, feats, n_hashes=16, bands=8, threshold=0.8
        )
    )
    assert len(baseline) == 6  # all rejected against the family
    out: dict = {}
    got = incremental_minhash_dedup_indexed(
        batch, idx, feats, n_hashes=16, bands=8, threshold=0.8,
        decision_out=out,
    )
    assert out["join_form"] == "band_key_batch_x_index"
    # 6 batch docs × 40-doc family × 8 bands of matches
    assert out["est_join_rows"] >= 6 * 40 * 8
    assert _collected(got) == baseline
    with pytest.raises(ValueError, match="over budget"):
        incremental_minhash_dedup_indexed(
            batch, idx, feats, n_hashes=16, bands=8, threshold=0.8,
            max_candidate_pairs=50,
        )


def test_curate_report_records_dedup_band_plan(spark, tmp_path):  # noqa: F811
    """Both curate near-dup branches persist the planner verdict in the
    run report (the decontam_join_plan pattern). The within-batch
    branch records the self-join shape; the standing-index branch the
    batch×index shape."""
    from tests.conftest import SF_DIR
    from yelp_recommender_spark.curate import curate_corpus

    report = curate_corpus(
        spark, SF_DIR, str(tmp_path / "out"), seq_len=128
    )
    plan = report["dedup_band_plan"]
    assert plan and plan["n_rows"] > 0
    assert "est_pairs" in plan and "explosion" in plan

    report = curate_corpus(
        spark,
        SF_DIR,
        str(tmp_path / "out_idx"),
        seq_len=128,
        corpus_index_dir=str(tmp_path / "index"),
    )
    plan = report["dedup_band_plan"]
    assert plan and plan["join_form"] == "band_key_batch_x_index"
    assert plan["est_join_rows"] is not None
