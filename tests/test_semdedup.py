"""Gates for `operators/semdedup.py` — cluster-then-prune semantic dedup.

Strategy: the clustering step reuses `ivf_fit_assign` (gated by the ANN
suites); these tests pin the prune kernel against an independent numpy
replication, the greedy contract's invariants on seeded random data, the
greedy-vs-matrix chain divergence on a hand-built fixture, the
null-vector pass-through convention, the cluster-size fail-fast, and
partition-layout invariance.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from yelp_recommender_spark.operators.semdedup import semantic_dedup

DIM = 6


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return (v / np.linalg.norm(v)).tolist()


def _bundle(rng, center, n, noise):
    """n unit vectors around a unit center direction."""
    out = []
    for _ in range(n):
        out.append(_unit(np.asarray(center) + rng.normal(0, noise, DIM)))
    return out


def _random_fixture(spark, seed=7, n_per=40):
    rng = np.random.default_rng(seed)
    centers = np.eye(DIM)[:3]
    rows = []
    i = 0
    for c in centers:
        for v in _bundle(rng, c, n_per, 0.25):
            rows.append((i, v))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, embedding array<double>")


def _numpy_model(assigned_rows, centers, eps, mode):
    """Independent replication of the prune contract over the
    ivf_fit_assign output (id, vec, centroid_id)."""
    C = np.asarray(centers, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    tau = 1.0 - eps
    verdicts = {}
    by_cluster: dict[int, list] = {}
    for r in assigned_rows:
        by_cluster.setdefault(r["centroid_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = np.array([m["doc_id"] for m in members])
        X = np.array([m["vec"] for m in members], dtype=np.float64)
        csim = X @ C[cid]
        order = np.lexsort((ids, csim))
        Xo, ido = X[order], ids[order]
        S = Xo @ Xo.T
        n = len(ids)
        if mode == "matrix":
            prior = np.tril(np.ones((n, n), dtype=bool), k=-1)
            M = np.where(prior, S, -np.inf).max(axis=1)
            for i in range(n):
                verdicts[int(ido[i])] = bool(i == 0 or M[i] < tau)
        else:
            kept_rows = []
            for i in range(n):
                if kept_rows and S[i, kept_rows].max() >= tau:
                    verdicts[int(ido[i])] = False
                    continue
                verdicts[int(ido[i])] = True
                kept_rows.append(i)
    return verdicts


@pytest.mark.parametrize("mode", ["greedy", "matrix"])
def test_prune_kernel_matches_numpy_model(spark, mode):
    from yelp_recommender_spark.operators.ann import ivf_fit_assign

    df = _random_fixture(spark)
    eps = 0.12
    out = semantic_dedup(
        df, n_clusters=3, eps=eps, seed=11, sample_n=1000, mode=mode
    ).collect()
    assigned, centers = ivf_fit_assign(
        df, id_col="doc_id", vec_col="embedding", n_centroids=3, seed=11,
        sample_n=1000,
    )
    model = _numpy_model(assigned.collect(), centers, eps, mode)
    got = {r["doc_id"]: r["kept"] for r in out}
    assert got == model
    assert len(out) == df.count()


def test_greedy_invariants_on_random_data(spark):
    """The greedy contract's two guarantees: kept rows are pairwise
    below threshold within a cluster, and every dropped row has a kept
    partner at/above threshold."""
    df = _random_fixture(spark, seed=23)
    eps = 0.15
    tau = 1.0 - eps
    out = semantic_dedup(df, n_clusters=3, eps=eps, seed=5, sample_n=1000)
    rows = out.collect()
    vecs = {
        r["doc_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in df.collect()
    }
    for r in vecs:
        vecs[r] = vecs[r] / np.linalg.norm(vecs[r])
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["centroid_id"], []).append(r)
    n_dropped = 0
    for members in by_cluster.values():
        kept = [r for r in members if r["kept"]]
        dropped = [r for r in members if not r["kept"]]
        n_dropped += len(dropped)
        for i, a in enumerate(kept):
            for b in kept[i + 1:]:
                assert vecs[a["doc_id"]] @ vecs[b["doc_id"]] < tau
        for d in dropped:
            best = max(vecs[d["doc_id"]] @ vecs[k["doc_id"]] for k in kept)
            assert best >= tau - 1e-9
            assert d["max_kept_sim"] >= round(tau, 6) - 1e-6
    assert n_dropped > 0  # the fixture's noise level actually exercises drops


def test_matrix_mode_drops_chains_greedy_preserves(spark):
    """a~b, b~c, cos(a,c) < tau: greedy keeps the chain's endpoints,
    matrix mode (paper form) drops everything after the first link."""
    angles = [0.0, 26.0, 52.0, 110.0]
    rows = [
        (i, [math.cos(math.radians(a)), math.sin(math.radians(a))])
        for i, a in enumerate(angles)
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    eps = 1.0 - math.cos(math.radians(30.0))
    kw = dict(n_clusters=1, eps=eps, seed=3, sample_n=100)
    greedy = {
        r["doc_id"] for r in semantic_dedup(df, **kw).collect() if r["kept"]
    }
    matrix = {
        r["doc_id"]
        for r in semantic_dedup(df, mode="matrix", **kw).collect()
        if r["kept"]
    }
    # processing order (farthest from the ~47-deg centroid first):
    # 110, 0, 26, 52. 26 is within 30 deg of 0 -> dropped in both.
    # 52 is within 30 deg only of (dropped) 26: greedy keeps, matrix drops.
    assert greedy == {3, 0, 2}
    assert matrix == {3, 0}


def test_null_vectors_pass_unchecked(spark):
    rows = [
        (1, _unit([1, 0, 0, 0, 0, 0])),
        (2, _unit([1.0, 0.001, 0, 0, 0, 0])),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    out = {
        r["doc_id"]: r
        for r in semantic_dedup(
            df, n_clusters=1, eps=0.05, sample_n=10
        ).collect()
    }
    assert len(out) == 3
    assert out[3]["kept"] and out[3]["centroid_id"] is None
    # the two near-identical directions deduplicate to one survivor
    assert sorted([out[1]["kept"], out[2]["kept"]]) == [False, True]


def test_cluster_cap_fails_fast(spark):
    df = _random_fixture(spark, n_per=10)
    with pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup(
            df, n_clusters=1, eps=0.1, sample_n=100, max_cluster_rows=5
        ).collect()


def test_arg_validation(spark):
    df = _random_fixture(spark, n_per=2)
    with pytest.raises(ValueError, match="mode"):
        semantic_dedup(df, mode="bogus")
    with pytest.raises(ValueError, match="n_clusters"):
        semantic_dedup(df, n_clusters=0)
    with pytest.raises(ValueError, match="max_cluster_rows"):
        semantic_dedup(df, max_cluster_rows=0)


def test_partition_layout_invariance(spark):
    df = _random_fixture(spark, seed=31)
    kw = dict(n_clusters=3, eps=0.12, seed=11, sample_n=1000)
    a = {
        r["doc_id"]: (r["kept"], r["centroid_id"], r["centroid_sim"])
        for r in semantic_dedup(df.repartition(7), **kw).collect()
    }
    b = {
        r["doc_id"]: (r["kept"], r["centroid_id"], r["centroid_sim"])
        for r in semantic_dedup(df.repartition(2), **kw).collect()
    }
    assert a == b


def test_blocked_matrix_kernel_beyond_one_block(spark):
    """Clusters larger than the 512-row kernel block exercise the
    slab-wise prior-max path — verdicts must equal a full-matrix numpy
    reference."""
    rng = np.random.default_rng(41)
    n = 1300
    vecs = [_unit(np.eye(DIM)[0] + rng.normal(0, 0.3, DIM)) for _ in range(n)]
    df = spark.createDataFrame(
        list(enumerate(vecs)), "doc_id long, embedding array<double>"
    )
    eps = 0.02
    out = {
        r["doc_id"]: r["kept"]
        for r in semantic_dedup(
            df, n_clusters=1, eps=eps, sample_n=2000, mode="matrix"
        ).collect()
    }
    from yelp_recommender_spark.operators.ann import ivf_fit_assign

    assigned, centers = ivf_fit_assign(
        df, id_col="doc_id", vec_col="embedding", n_centroids=1,
        seed=42, sample_n=2000,
    )
    model = _numpy_model(assigned.collect(), centers, eps, "matrix")
    assert out == model
    assert not all(out.values())  # the noise level actually drops rows


def test_plan_has_no_cartesian_product(spark):
    df = _random_fixture(spark, n_per=5)
    plan = semantic_dedup(
        df, n_clusters=2, eps=0.1, sample_n=100
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
