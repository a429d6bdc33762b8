"""OPQ encoding for IVF-PQ (r8, opt-in): a learned orthogonal rotation
balances subspace energy before product quantization (Ge et al., CVPR
2013). The default stays encoding='raw' (q44/q45 dials bit-stable);
these tests pin that (a) the learned rotation is orthogonal and
deterministic, (b) OPQ measurably tightens ADC estimates on an
ANISOTROPIC corpus — the structure raw PQ under-serves, (c) recall is
not worse there, (d) the rotation round-trips through the persisted
index (built + queried via the CLI-facing builder), and (e) the
rotation/encoding pairing is validated, never silently mismatched."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

IDX_N = 400
DIM = 16
Q_N = 6
PARAMS = dict(k=3, n_centroids=8, n_probe=8, m=8, ksub=32, seed=42)


@pytest.fixture(scope="module")
def vectors(spark):  # noqa: F811
    """ANISOTROPIC corpus: a low-rank mixing matrix correlates the
    dims, so PQ's fixed coordinate-aligned subspaces carry very unequal
    (and cross-correlated) energy — the regime OPQ's rotation exists
    for. (The residual fixture is CLUSTERED; this one is correlated —
    the two opt-ins target different corpus structure.)"""
    rng = np.random.default_rng(11)
    mix = rng.standard_normal((4, DIM)) * np.array([8.0, 4.0, 2.0, 1.0])[
        :, None
    ]
    rows = [
        (
            i,
            [
                float(x)
                for x in rng.standard_normal(4) @ mix
                + 0.1 * rng.standard_normal(DIM)
            ],
        )
        for i in range(IDX_N)
    ]
    index = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    return index.filter(f"vec_id < {Q_N}"), index


def test_rotation_is_orthogonal_and_deterministic():
    from yelp_recommender_spark.operators.pq import train_opq_rotation

    rng = np.random.default_rng(3)
    X = rng.standard_normal((200, 16))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    R1, B1 = train_opq_rotation(X, m=8, ksub=16, seed=5)
    R2, B2 = train_opq_rotation(X, m=8, ksub=16, seed=5)
    assert np.allclose(R1 @ R1.T, np.eye(16), atol=1e-9)
    assert np.array_equal(R1, R2) and np.array_equal(B1, B2)
    with pytest.raises(ValueError, match="multiple"):
        train_opq_rotation(X[:, :15], m=8, ksub=16)


def test_opq_rotation_reduces_quantization_error():
    """The OPQ objective itself: reconstruction error of the rotated
    codebooks must beat identity-rotation PQ on correlated data."""
    from yelp_recommender_spark.operators.pq import (
        _lloyd,
        train_opq_rotation,
    )

    rng = np.random.default_rng(7)
    mix = rng.standard_normal((4, 16)) * np.array([8.0, 4.0, 2.0, 1.0])[
        :, None
    ]
    X = rng.standard_normal((300, 4)) @ mix + 0.1 * rng.standard_normal(
        (300, 16)
    )
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    m, ksub, dsub = 8, 16, 2

    def recon_err(R):
        Xr = X @ R
        err = 0.0
        for j in range(m):
            sub = Xr[:, j * dsub : (j + 1) * dsub]
            c = _lloyd(sub, ksub, 42 + j, 6)
            a = (-2.0 * (sub @ c.T) + (c * c).sum(axis=1)).argmin(axis=1)
            err += ((sub - c[a]) ** 2).sum()
        return err

    R, _ = train_opq_rotation(X, m=m, ksub=ksub, seed=42)
    assert recon_err(R) < 0.8 * recon_err(np.eye(16))


def test_opq_adc_estimates_are_tighter(vectors):
    import yelp_recommender_spark.operators.ann as ann
    import yelp_recommender_spark.operators.pq as pq

    queries, index = vectors
    truth = {
        (r.query_id, r.neighbor_id): r.cos
        for r in ann.cosine_topk(queries, index, k=200).collect()
    }

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
    err_opq = mean_err("opq")
    assert err_opq < err_raw, (err_opq, err_raw)


def test_opq_recall_not_worse(vectors):
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

    r_raw, r_opq = recall("raw"), recall("opq")
    assert r_opq >= r_raw, (r_opq, r_raw)


def test_opq_roundtrips_through_persisted_index(vectors, spark, tmp_path):  # noqa: F811
    """build_ann_index(encoding='opq') persists the rotation as a
    fourth artifact and query_ann_index serves identically to the
    one-shot operator."""
    import yelp_recommender_spark.operators.pq as pq
    from yelp_recommender_spark.ann_index import (
        build_ann_index,
        query_ann_index,
    )

    queries, index = vectors
    src = str(tmp_path / "emb.parquet")
    index.write.mode("overwrite").parquet(src)
    idx_dir = str(tmp_path / "idx")
    report = build_ann_index(
        spark, src, idx_dir, tier="ivfpq",
        n_centroids=PARAMS["n_centroids"], m=PARAMS["m"],
        ksub=PARAMS["ksub"], seed=PARAMS["seed"], encoding="opq",
    )
    assert report["tier"] == "ivfpq"
    import os

    assert os.path.isdir(os.path.join(idx_dir, "rotation"))
    served = {
        (r.query_id, r.neighbor_id, r.cos_pq)
        for r in query_ann_index(
            spark, idx_dir, queries, k=PARAMS["k"],
            n_probe=PARAMS["n_probe"],
        ).collect()
    }
    oneshot = {
        (r.query_id, r.neighbor_id, r.cos_pq)
        for r in pq.ivfpq_topk(
            queries, index, encoding="opq", **PARAMS
        ).collect()
    }
    assert served == oneshot


def test_rotation_encoding_pairing_is_validated(vectors, spark):  # noqa: F811
    import yelp_recommender_spark.operators.pq as pq
    from yelp_recommender_spark.operators.ann import ivf_fit_assign

    queries, index = vectors
    assigned, centers = ivf_fit_assign(
        index, "vec_id", "embedding", PARAMS["n_centroids"], 42, 8
    )
    books, coded, rotation = pq.train_and_encode_opq(
        assigned, id_col="vec_id", m=PARAMS["m"], ksub=PARAMS["ksub"],
        seed=42,
    )
    with pytest.raises(ValueError, match="rotation"):
        pq.ivfpq_topk_indexed(
            queries, coded, centers, books, encoding="opq"
        )
    with pytest.raises(ValueError, match="rotation"):
        pq.ivfpq_topk_indexed(
            queries, coded, centers, books, encoding="raw",
            rotation=rotation,
        )
    with pytest.raises(ValueError, match="encoding"):
        pq.ivfpq_topk(queries, index, encoding="bogus", **PARAMS)
