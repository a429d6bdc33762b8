"""Unit tests for the blocked-Jaccard operator's edge semantics
(ADVICE r2 #2 boundary rounding, #5 df_cap exclusion visibility).
Oracle-level coverage lives in test_queries_vs_oracle.py (q30-q35)."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def boundary_docs(spark):  # noqa: F811
    """Pair (A=1, B=2) engineered onto the rounding boundary of the
    ambiguous (both-docs-hot) path:

    - shingle H is in 4 docs (df > cap=2 → hot); c1..c5 shared by A,B
      only (df=2 → cold, joinable); u* unique (df=1 → cold).
    - A: H + c1..c5 + uA (7); B: H + c1..c5 + uB1,uB2 (8).
    - cold overlap c=5, h1=h2=1 → hmin=1 → ambiguous path;
      jac_ub = (5+1)/(7+8-6) = 2/3 exactly; true jaccard = 6/9 = 2/3.

    At threshold 0.666667: 2/3 < 0.666667 unrounded (the old prefilter
    dropped the pair) but ROUND(2/3, 6) = 0.666667 passes — matching the
    verify step and the oracle convention.
    """
    H, c = "hot", [f"c{i}" for i in range(5)]
    rows = [
        (1, [H] + c + ["uA"]),
        (2, [H] + c + ["uB1", "uB2"]),
        (3, [H, "uC1", "uC2"]),
        (4, [H, "uD1", "uD2"]),
    ]
    return spark.createDataFrame(rows, "doc_id long, shingles array<string>")


def test_jac_ub_prefilter_rounds_like_the_verify_step(boundary_docs):
    from yelp_recommender_spark.operators.dedup import blocked_jaccard_pairs

    got = blocked_jaccard_pairs(
        boundary_docs, threshold=0.666667, df_cap=2
    ).collect()
    assert [(r.d1, r.d2, r.jaccard) for r in got] == [(1, 2, 0.666667)]


def test_blocking_exclusions_measures_the_blind_spot(spark):  # noqa: F811
    """Docs 3/4 share ONLY the hot shingle — invisible to blocking; the
    stats row must say so instead of staying silent (ADVICE r2 #5)."""
    from yelp_recommender_spark.operators.dedup import (
        blocked_jaccard_pairs,
        blocking_exclusions,
    )

    rows = [
        (1, ["hot", "a1", "a2"]),
        (2, ["hot", "a1", "a2"]),
        (3, ["hot"]),
        (4, ["hot"]),
        (5, ["hot"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    stats = blocking_exclusions(docs, df_cap=2).head()
    assert stats.hot_shingles == 1
    assert stats.fully_hot_docs == 3  # docs 3,4,5: all shingles hot

    # the blocked join indeed cannot see the (3,4)/(3,5)/(4,5) pairs —
    # that's exactly the signal the stats surface
    pairs = {
        (r.d1, r.d2)
        for r in blocked_jaccard_pairs(docs, threshold=0.5, df_cap=2).collect()
    }
    assert pairs == {(1, 2)}


def test_cdc_chunks_resynchronize_after_insertion(spark):  # noqa: F811
    """The content-defined-chunking property q28 relies on: inserting
    tokens mid-document changes only the chunk(s) containing the edit —
    downstream chunks re-align because boundaries depend on content, not
    position (a fixed-width chunker would shift every later chunk)."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    base = [f"w{int(x)}" for x in rng.integers(0, 500, size=200)]
    edited = base[:100] + ["inserted", "tokens", "here"] + base[100:]
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, toks array<string>"
    )
    ex = df.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    boundary = F.when(F.substring(F.md5("tok"), 1, 2) < "40", 1).otherwise(0)
    w = Window.partitionBy("doc_id").orderBy("pos")
    chunks = (
        ex.withColumn("chunk", F.sum(boundary).over(w))
        .groupBy("doc_id", "chunk")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("fp")
        )
    )
    fps = {
        d: {r.fp for r in rows}
        for d, rows in (
            (1, chunks.filter("doc_id = 1").collect()),
            (2, chunks.filter("doc_id = 2").collect()),
        )
    }
    overlap = len(fps[1] & fps[2]) / len(fps[1])
    # ~50 chunks; the edit can touch only the chunk(s) around position
    # 100 — the vast majority of fingerprints must survive verbatim
    assert overlap >= 0.9, f"CDC resync failed: only {overlap:.0%} shared"


def test_minhash_candidate_prob_matches_q32_config():
    from yelp_recommender_spark.operators.dedup import minhash_candidate_prob

    # q32's 8 bands × 2 rows: near-dups at j=0.99 are near-certain
    # candidates; unrelated docs at j=0.1 almost never collide
    assert minhash_candidate_prob(0.99, 8, 2) > 0.999
    assert minhash_candidate_prob(0.1, 8, 2) < 0.08
    # monotone in j; clamped at the edges
    assert minhash_candidate_prob(0.0, 8, 2) == 0.0
    assert minhash_candidate_prob(1.0, 8, 2) == 1.0
    assert minhash_candidate_prob(0.5, 8, 2) < minhash_candidate_prob(0.8, 8, 2)


def test_log_exclusions_warns_on_fully_hot_docs(spark, caplog):  # noqa: F811
    import logging

    from yelp_recommender_spark.operators.dedup import blocked_jaccard_pairs

    rows = [
        (1, ["hot", "x"]),
        (2, ["hot", "x"]),
        (3, ["hot"]),
        (4, ["hot"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    with caplog.at_level(
        logging.WARNING, logger="yelp_recommender_spark.operators.dedup"
    ):
        blocked_jaccard_pairs(
            docs, threshold=0.5, df_cap=2, log_exclusions=True
        ).collect()
    assert any("invisible" in r.message for r in caplog.records)


def test_indexed_dedup_survives_parquet_round_trip(spark, tmp_path):  # noqa: F811
    """The standing-corpus contract: band keys + shingles written to
    parquet and read back must give the same rejections as the in-memory
    corpus path (the index IS the persisted form)."""
    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.dedup import (
        band_key_index,
        incremental_minhash_dedup,
        incremental_minhash_dedup_indexed,
        token_shingles,
    )

    texts = [
        (i, f"one two three four five six seven unique{i} tail")
        for i in range(8)
    ] + [(100, "one two three four five six seven unique3 tail")]  # dup of 3
    docs = (
        spark.createDataFrame(texts, "doc_id long, text string")
        .withColumn("toks", F.split("text", " "))
        .withColumn("shingles", token_shingles("toks", k=3))
        .select("doc_id", "shingles")
    )
    corpus = docs.filter(F.col("doc_id") < 100)
    batch = docs.filter(F.col("doc_id") >= 100)

    direct = sorted(
        tuple(r)
        for r in incremental_minhash_dedup(
            batch, corpus, n_hashes=16, bands=8, threshold=0.8
        ).collect()
    )

    bk_path = str(tmp_path / "band_keys")
    sh_path = str(tmp_path / "shingles")
    band_key_index(corpus, n_hashes=16, bands=8).write.parquet(bk_path)
    corpus.write.parquet(sh_path)
    via_disk = sorted(
        tuple(r)
        for r in incremental_minhash_dedup_indexed(
            batch,
            spark.read.parquet(bk_path),
            spark.read.parquet(sh_path),
            n_hashes=16,
            bands=8,
            threshold=0.8,
        ).collect()
    )
    assert direct == via_disk
    assert len(direct) == 1 and direct[0][0] == 100  # the planted dup
