"""Embedding preprocessing (operators/embed_prep.py): normalization
exactness, zero-vector safety, PCA invariants (dim, variance ordering,
distance preservation at full rank, whitening covariance)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)


def test_l2_normalize_unit_norms_and_zero_safety(spark):  # noqa: F811
    from yelp_recommender_spark.operators.embed_prep import (
        l2_normalize,
        vector_norm,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    out = l2_normalize(df)
    norms = {
        r.vec_id: r.n
        for r in out.select(
            "vec_id", vector_norm("unit_vec").alias("n")
        ).collect()
    }
    assert norms[1] == pytest.approx(1.0)
    assert norms[3] == pytest.approx(1.0)
    assert norms[2] == 0.0  # zero vector passes through
    row = {r.vec_id: r.unit_vec for r in out.collect()}
    assert row[1] == pytest.approx([0.6, 0.8])


def test_pca_invariants_on_embeddings(spark):  # noqa: F811
    from yelp_recommender_spark.operators.embed_prep import pca_project
    from yelp_recommender_spark.sources.tables import load_tables

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    dim = len(emb.select("embedding").head()[0])
    proj, ev = pca_project(emb, k=4)
    rows = proj.collect()
    assert all(len(r.pca_vec) == 4 for r in rows)
    # explained variance: a fraction per component, descending
    assert len(ev) == 4 and all(0 <= x <= 1 for x in ev)
    assert ev == sorted(ev, reverse=True)

    # full-rank projection preserves pairwise distances (rotation)
    full, _ = pca_project(emb.limit(20), k=dim)
    raw = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.limit(20).collect()
    }
    rot = {r.vec_id: r.pca_vec for r in full.collect()}

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ids = sorted(raw)[:6]
    for i in ids:
        for j in ids:
            assert d(raw[i], raw[j]) == pytest.approx(
                d(rot[i], rot[j]), rel=1e-6, abs=1e-6
            )


def test_pca_whitening_gives_unit_variance(spark):  # noqa: F811
    from yelp_recommender_spark.operators.embed_prep import pca_project
    from yelp_recommender_spark.sources.tables import load_tables

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    proj, _ = pca_project(emb, k=3, whiten=True)
    stats = proj.select(
        *[
            F.variance(F.element_at("pca_vec", i + 1)).alias(f"v{i}")
            for i in range(3)
        ]
    ).head()
    for i in range(3):
        assert stats[f"v{i}"] == pytest.approx(1.0, rel=1e-6)


def test_whiten_degenerate_rank_fails_loudly(spark):  # noqa: F811
    """ADVICE r4: whitening a component with (near-)zero sample variance
    must raise instead of silently emitting NaN/Inf vectors."""
    import pytest

    from yelp_recommender_spark.operators.embed_prep import pca_project

    # rank-1 data: any k >= 2 has a zero-variance second component
    rows = [(i, [float(i), 2.0 * i, 3.0 * i]) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="zero variance"):
        pca_project(df, k=2, whiten=True)
