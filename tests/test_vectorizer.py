"""Feature-hashing vectorizer (operators/vectorizer.py): hash-family
properties, densification, determinism, and the end-to-end text→vector→
ANN near-dup path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


def _tokens_long(spark, docs):  # noqa: F811
    from yelp_recommender_spark.functions.text import tokens_col

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return df.withColumn("toks", tokens_col("text")).select(
        "doc_id", F.explode("toks").alias("token")
    )


def test_hashed_dim_and_sign_ranges(spark):  # noqa: F811
    from yelp_recommender_spark.operators.vectorizer import (
        hashed_dim,
        hashed_sign,
    )

    toks = spark.createDataFrame(
        [(f"term{i}",) for i in range(500)], "token string"
    )
    rows = toks.select(
        hashed_dim("token", 64).alias("d"), hashed_sign("token").alias("s")
    ).collect()
    assert all(0 <= r.d < 64 for r in rows)
    assert set(r.s for r in rows) == {-1, 1}
    # both signs and most dims are hit — the hash actually spreads
    assert len({r.d for r in rows}) > 48
    with pytest.raises(ValueError):
        hashed_dim("token", 1 << 20)


def test_assemble_embeddings_densifies(spark):  # noqa: F811
    from yelp_recommender_spark.operators.vectorizer import (
        assemble_embeddings,
    )

    long_df = spark.createDataFrame(
        [(1, 0, 2.5), (1, 3, -1.0), (2, 7, 4.0)],
        "doc_id long, dim int, weight double",
    )
    got = {
        r.doc_id: r.embedding
        for r in assemble_embeddings(long_df, n_dims=8).collect()
    }
    assert got[1] == [2.5, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0]
    assert got[2] == [0.0] * 7 + [4.0]


def test_vectorizer_deterministic_under_repartition(spark):  # noqa: F811
    from yelp_recommender_spark.operators.vectorizer import (
        hashed_tfidf_long,
    )

    docs = [(i, f"alpha beta gamma delta doc{i % 5} epsilon") for i in range(40)]
    tl = _tokens_long(spark, docs)
    a = {
        (r.doc_id, r.dim): r.weight
        for r in hashed_tfidf_long(tl, n_dims=32).collect()
    }
    b = {
        (r.doc_id, r.dim): r.weight
        for r in hashed_tfidf_long(tl.repartition(11), n_dims=32).collect()
    }
    assert a == b


def test_text_to_ann_near_dup_end_to_end(spark):  # noqa: F811
    """The full bridge: raw text → hashed vectors → cosine near-dup.
    Two families of documents sharing almost all terms must pair up
    within-family; cross-family cosine stays low."""
    from yelp_recommender_spark.operators.ann import cosine_pairs_above
    from yelp_recommender_spark.operators.vectorizer import (
        assemble_embeddings,
        hashed_tfidf_long,
    )

    fam_a = "the market opened higher on strong tech earnings today"
    fam_b = "rain and wind battered the northern coast all weekend"
    docs = []
    for i in range(5):
        docs.append((i, fam_a + f" extra{i}"))
        docs.append((10 + i, fam_b + f" filler{i}"))
    tl = _tokens_long(spark, docs)
    vecs = assemble_embeddings(
        hashed_tfidf_long(tl, n_dims=64), n_dims=64
    ).withColumnRenamed("doc_id", "vec_id")
    # each doc's unique term carries the highest IDF, so within-family
    # cosine lands near 0.35 and cross-family below 0.21 — threshold 0.3
    # separates the families cleanly
    pairs = {
        (r.id1, r.id2)
        for r in cosine_pairs_above(vecs, threshold=0.3).collect()
    }
    within_a = {(i, j) for i in range(5) for j in range(i + 1, 5)}
    within_b = {(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)}
    # signed-hash collisions can cancel one doc's shared-term mass (the
    # hashing trick's known noise), so require MOST within-family pairs,
    # not all — and never a cross-family pair
    assert len(pairs & within_a) >= 8, pairs & within_a
    assert len(pairs & within_b) >= 6, pairs & within_b
    assert not any(a < 10 <= b for a, b in pairs)  # no cross-family pair
