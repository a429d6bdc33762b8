"""Residual IVF-PQ encoding (r8, opt-in): PQ over centroid residuals
with the q·centroid base term restored at ADC time — the standard
IVF-ADC formulation. The default stays encoding='raw' (q44/q45 dials
bit-stable); these tests pin that the opt-in (a) measurably improves
the ADC estimates, (b) never hurts recall on the representative
fixture, (c) round-trips through the prebuilt-index serving path, and
(d) rejects an unstated/unknown encoding (a raw/residual mismatch
would silently score garbage)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

IDX_N = 400
DIM = 16
Q_N = 6
N_CLUSTERS = 16
PARAMS = dict(k=3, n_centroids=16, n_probe=16, m=8, ksub=64, seed=42)


@pytest.fixture(scope="module")
def vectors(spark):  # noqa: F811
    """CLUSTERED corpus — residual encoding presupposes the IVF
    centroids capture structure (real embedding corpora cluster; an
    isotropic-gaussian fixture is the degenerate case where centroids
    sit near the origin and residual ≈ raw, measured err_ratio ~1.1).
    16 planted clusters, within-cluster noise 0.8: measured err_ratio
    raw/residual = 2.8, recall@3 0.556 → 0.667."""
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((N_CLUSTERS, DIM)) * 2.0
    rows = [
        (
            i,
            [
                float(x)
                for x in cents[i % N_CLUSTERS]
                + 0.8 * rng.standard_normal(DIM)
            ],
        )
        for i in range(IDX_N)
    ]
    index = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    return index.filter(f"vec_id < {Q_N}"), index


def _truth(spark, queries, index):  # noqa: F811
    import yelp_recommender_spark.operators.ann as ann

    return {
        (r.query_id, r.neighbor_id): r.cos
        for r in ann.cosine_topk(queries, index, k=200).collect()
    }


def test_residual_adc_estimates_are_tighter(vectors):
    """Same (m, ksub) budget, n_probe = n_centroids (no routing loss):
    the mean |ADC − true cosine| over scored pairs must shrink under
    residual encoding — quantizing residual energy instead of vector
    energy is the whole point."""
    import yelp_recommender_spark.operators.pq as pq

    queries, index = vectors
    truth = _truth(index.sparkSession, queries, index)

    def mean_err(encoding):
        out = pq.ivfpq_topk(queries, index, encoding=encoding, **PARAMS)
        errs = [
            abs(r.cos_pq - truth[(r.query_id, r.neighbor_id)])
            for r in out.collect()
            if (r.query_id, r.neighbor_id) in truth
        ]
        assert errs
        return sum(errs) / len(errs)

    err_raw = mean_err("raw")
    err_res = mean_err("residual")
    assert err_res < err_raw, (err_res, err_raw)
    # measured 2.8x on this fixture; gate at a conservative 1.5x
    assert err_res < err_raw / 1.5, (err_res, err_raw)


def test_residual_recall_not_worse(vectors):
    import yelp_recommender_spark.operators.ann as ann
    import yelp_recommender_spark.operators.pq as pq

    queries, index = vectors
    want = {
        (r.query_id, r.neighbor_id)
        for r in ann.cosine_topk(queries, index, k=3).collect()
    }

    def recall(encoding):
        out = pq.ivfpq_topk(queries, index, encoding=encoding, **PARAMS)
        got = {(r.query_id, r.neighbor_id) for r in out.collect()}
        return len(got & want) / len(want)

    r_raw, r_res = recall("raw"), recall("residual")
    assert r_res >= r_raw, (r_res, r_raw)
    assert r_res >= 0.6  # measured 0.667; one BLAS rank flip of margin


def test_residual_roundtrips_through_indexed_serving(vectors, spark):  # noqa: F811
    """Prebuilt-index path: residual codes + encoding='residual' serve
    identically to the one-shot operator; serving residual codes AS raw
    produces different scores (the mismatch is visible, not silent)."""
    import yelp_recommender_spark.operators.pq as pq
    from yelp_recommender_spark.operators.ann import ivf_fit_assign

    queries, index = vectors
    assigned, centers = ivf_fit_assign(
        index, "vec_id", "embedding", PARAMS["n_centroids"], 42, 8
    )
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in centers[i]]) for i in range(len(centers))],
        "centroid_id int, _center array<double>",
    )
    from pyspark.sql import functions as F

    resid = assigned.join(F.broadcast(centers_df), "centroid_id").withColumn(
        "_resid", F.zip_with("vec", "_center", lambda a, b: a - b)
    )
    books = pq.train_codebooks(
        resid, id_col="vec_id", vec_col="_resid",
        m=PARAMS["m"], ksub=PARAMS["ksub"], seed=42, normalize=False,
    )
    coded = pq.pq_encode(
        resid, books, "vec_id", "_resid",
        passthrough=["centroid_id"], normalize=False,
    )
    served = pq.ivfpq_topk_indexed(
        queries, coded, centers, books,
        k=3, n_probe=PARAMS["n_probe"], id_col="vec_id",
        vec_col="embedding", encoding="residual",
    )
    direct = pq.ivfpq_topk(queries, index, encoding="residual", **PARAMS)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, direct.collect())
    )
    mismatched = pq.ivfpq_topk_indexed(
        queries, coded, centers, books,
        k=3, n_probe=PARAMS["n_probe"], id_col="vec_id",
        vec_col="embedding", encoding="raw",
    )
    assert sorted(map(tuple, mismatched.collect())) != sorted(
        map(tuple, direct.collect())
    )


def test_unknown_encoding_rejected(vectors):
    import yelp_recommender_spark.operators.pq as pq

    queries, index = vectors
    with pytest.raises(ValueError, match="unknown encoding"):
        pq.ivfpq_topk(queries, index, encoding="sq8", **PARAMS)
    with pytest.raises(ValueError, match="unknown encoding"):
        pq.ivfpq_topk_indexed(
            queries, index, np.zeros((2, DIM)), np.zeros((2, 2, 8)),
            encoding="nope",
        )


def test_raw_default_unchanged(vectors):
    """encoding='raw' must be byte-identical to the pre-r8 call shape —
    the frozen q44/q45 dials ride on it."""
    import yelp_recommender_spark.operators.pq as pq

    queries, index = vectors
    default = pq.ivfpq_topk(queries, index, **PARAMS)
    explicit = pq.ivfpq_topk(queries, index, encoding="raw", **PARAMS)
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_residual_persisted_index_roundtrip(vectors, tmp_path, spark):  # noqa: F811
    """build_ann_index(encoding='residual') records the encoding in
    meta.json and query_ann_index scores the codes as residuals —
    matching the one-shot operator; a pre-r8 meta (no encoding field)
    defaults to raw."""
    import json
    import os

    import yelp_recommender_spark.operators.pq as pq
    from yelp_recommender_spark.ann_index import (
        build_ann_index,
        query_ann_index,
    )

    queries, index = vectors
    src = str(tmp_path / "emb")
    index.write.parquet(src)
    idx_dir = str(tmp_path / "idx")
    report = build_ann_index(
        spark, src, idx_dir, tier="ivfpq",
        n_centroids=PARAMS["n_centroids"], m=PARAMS["m"],
        ksub=PARAMS["ksub"], encoding="residual",
    )
    assert report["tier"] == "ivfpq"
    meta = json.load(open(os.path.join(idx_dir, "meta.json")))
    assert meta["encoding"] == "residual"

    served = query_ann_index(
        spark, idx_dir, queries, k=3, n_probe=PARAMS["n_probe"]
    )
    direct = pq.ivfpq_topk(queries, index, encoding="residual", **PARAMS)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, direct.collect())
    )

    with pytest.raises(ValueError, match="encoding must be"):
        build_ann_index(
            spark, src, str(tmp_path / "bad"), tier="ivfpq",
            encoding="sq8",
        )
