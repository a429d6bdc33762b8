"""Composed OPQ×residual IVF-PQ encoding (r9): rotate, route in the
original space, quantize the ROTATED RESIDUAL — the two r8 opt-ins
(`encoding='residual'`, `encoding='opq'`) are complementary
refinements, and the composition must be at least as good as the
better single on BOTH structure fixtures (clustered → residual's
regime; anisotropic/correlated → OPQ's regime).

Measured on these fixtures (30 queries, k=3, fixed seeds):

                 err_residual  err_opq  err_comp   rec_res  rec_opq  rec_comp
  clustered        0.01279     0.02702  0.01288     0.767    0.556    0.778
  anisotropic      0.02314     0.02169  0.01807     0.556    0.500    0.567

Gates: composed ADC error ≤ 1.05 × the better single (ties allowed —
on the clustered fixture the rotation has nothing to add and must not
hurt), composed recall ≥ the better single − 0.04 (a few BLAS rank
flips of margin at 90 truth pairs). Also: the persisted-index
round-trip with the rotation artifact, and the rotation/encoding
pairing validation."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

IDX_N = 400
DIM = 16
Q_N = 30


def _clustered(spark):
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((16, DIM)) * 2.0
    rows = [
        (
            i,
            [
                float(x)
                for x in cents[i % 16] + 0.8 * rng.standard_normal(DIM)
            ],
        )
        for i in range(IDX_N)
    ]
    index = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = dict(k=3, n_centroids=16, n_probe=16, m=8, ksub=64, seed=42)
    return index.filter(f"vec_id < {Q_N}"), index, params


def _aniso(spark):
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
    index = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = dict(k=3, n_centroids=8, n_probe=8, m=8, ksub=32, seed=42)
    return index.filter(f"vec_id < {Q_N}"), index, params


@pytest.mark.parametrize("fixture", ["clustered", "aniso"])
def test_composed_beats_or_ties_the_better_single(spark, fixture):  # noqa: F811
    import yelp_recommender_spark.operators.ann as ann
    import yelp_recommender_spark.operators.pq as pq

    queries, index, P = (_clustered if fixture == "clustered" else _aniso)(
        spark
    )
    truth = {
        (r.query_id, r.neighbor_id): r.cos
        for r in ann.cosine_topk(queries, index, k=200).collect()
    }
    want = {
        (r.query_id, r.neighbor_id)
        for r in ann.cosine_topk(queries, index, k=3).collect()
    }

    def run(encoding):
        out = pq.ivfpq_topk(queries, index, encoding=encoding, **P).collect()
        errs = [
            abs(r.cos_pq - truth[(r.query_id, r.neighbor_id)])
            for r in out
            if (r.query_id, r.neighbor_id) in truth
        ]
        got = {(r.query_id, r.neighbor_id) for r in out}
        return sum(errs) / len(errs), len(got & want) / len(want)

    err_res, rec_res = run("residual")
    err_opq, rec_opq = run("opq")
    err_comp, rec_comp = run("opq_residual")
    best_err = min(err_res, err_opq)
    best_rec = max(rec_res, rec_opq)
    assert err_comp <= best_err * 1.05, (fixture, err_comp, best_err)
    assert rec_comp >= best_rec - 0.04, (fixture, rec_comp, best_rec)
    assert rec_comp >= 0.55


def test_composed_roundtrips_persisted_index(spark, tmp_path):  # noqa: F811
    import json
    import os

    import yelp_recommender_spark.operators.pq as pq
    from yelp_recommender_spark.ann_index import (
        build_ann_index,
        query_ann_index,
    )

    queries, index, P = _clustered(spark)
    src = str(tmp_path / "emb")
    index.write.parquet(src)
    idx_dir = str(tmp_path / "idx")
    report = build_ann_index(
        spark, src, idx_dir, tier="ivfpq",
        n_centroids=P["n_centroids"], m=P["m"], ksub=P["ksub"],
        encoding="opq_residual",
    )
    assert report["tier"] == "ivfpq"
    meta = json.load(open(os.path.join(idx_dir, "meta.json")))
    assert meta["encoding"] == "opq_residual"
    # the rotation is the fourth serving artifact
    assert os.path.isdir(os.path.join(idx_dir, "rotation"))

    served = query_ann_index(
        spark, idx_dir, queries, k=3, n_probe=P["n_probe"]
    )
    direct = pq.ivfpq_topk(queries, index, encoding="opq_residual", **P)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_rotation_encoding_pairing_validated(spark):  # noqa: F811
    import yelp_recommender_spark.operators.pq as pq

    queries, index, P = _clustered(spark)
    # composed without a rotation → garbage scores → refused
    with pytest.raises(ValueError, match="rotation"):
        pq.ivfpq_topk_indexed(
            queries, index, np.zeros((2, DIM)), np.zeros((2, 2, 8)),
            encoding="opq_residual",
        )
    # plain residual WITH a rotation → equally refused
    with pytest.raises(ValueError, match="rotation"):
        pq.ivfpq_topk_indexed(
            queries, index, np.zeros((2, DIM)), np.zeros((2, 2, 8)),
            encoding="residual", rotation=np.eye(DIM),
        )
    with pytest.raises(ValueError, match="unknown encoding"):
        pq.ivfpq_topk(queries, index, encoding="residual_opq", **P)
