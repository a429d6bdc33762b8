"""Property-based pins for the semantic-dedup contract (hypothesis):
for ANY random vector set, eps, cluster count, and kernel mode, the
operator's verdicts equal an independent numpy replay of the documented
contract (cluster → farthest-first order → greedy-vs-kept or
matrix-vs-prior prune), and the greedy guarantees hold.

The unit tests use planted bundles; hypothesis covers what they can't:
duplicate vectors (exact ties broken by id), zero vectors, negative
cosines, eps outside [0, 1], K larger than the row count, and clusters
of size 1. Examples with any similarity inside the <1-ulp boundary band
are skipped — that band is declared unspecified by the cosine family's
contract (BLAS summation order)."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

BOUNDARY_EPS = 1e-9

vec_st = st.lists(
    st.lists(
        st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]),
        min_size=3,
        max_size=3,
    ),
    min_size=1,
    max_size=8,
)


def _model(assigned_rows, centers, eps, mode, id_key):
    C = np.asarray(centers, dtype=np.float64)
    nrm = np.linalg.norm(C, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    C = C / nrm
    tau = 1.0 - eps
    verdicts = {}
    by_cluster: dict[int, list] = {}
    for r in assigned_rows:
        by_cluster.setdefault(r["centroid_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = np.array([m[id_key] for m in members])
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
            kept = []
            for i in range(n):
                if kept and S[i, kept].max() >= tau:
                    verdicts[int(ido[i])] = False
                    continue
                verdicts[int(ido[i])] = True
                kept.append(i)
    return verdicts


def _off_boundary(assigned_rows, centers, eps):
    """No member-member or member-centroid similarity within the
    unspecified band of tau, and no centroid-sim ties between DISTINCT
    vectors (a tie's processing order would hinge on sub-ulp float
    identity; exact duplicates are fine — id breaks their tie)."""
    tau = 1.0 - eps
    C = np.asarray(centers, dtype=np.float64)
    nrm = np.linalg.norm(C, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    C = C / nrm
    by_cluster: dict[int, list] = {}
    for r in assigned_rows:
        by_cluster.setdefault(r["centroid_id"], []).append(r)
    for cid, members in by_cluster.items():
        X = np.array([m["vec"] for m in members], dtype=np.float64)
        S = X @ X.T
        off = np.abs(S - tau)
        np.fill_diagonal(off, 1.0)
        if not (off > BOUNDARY_EPS).all():
            return False
        csim = X @ C[cid]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if (
                    abs(csim[i] - csim[j]) <= BOUNDARY_EPS
                    and not np.array_equal(X[i], X[j])
                ):
                    return False
    return True


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=vec_st,
    eps=st.sampled_from([-0.1, 0.05, 0.3, 1.0, 2.5]),
    k=st.integers(min_value=1, max_value=4),
    mode=st.sampled_from(["greedy", "matrix"]),
)
def test_semdedup_matches_model(spark, vecs, eps, k, mode):  # noqa: F811
    from yelp_recommender_spark.operators.ann import ivf_fit_assign
    from yelp_recommender_spark.operators.semdedup import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "doc_id long, embedding array<double>",
    )
    assigned, centers = ivf_fit_assign(
        df, id_col="doc_id", vec_col="embedding",
        n_centroids=k, seed=5, sample_n=64,
    )
    rows = assigned.collect()
    assume(_off_boundary(rows, centers, eps))
    model = _model(rows, centers, eps, mode, "doc_id")

    out = semantic_dedup(
        df, n_clusters=k, eps=eps, seed=5, sample_n=64, mode=mode
    ).collect()
    got = {r["doc_id"]: r["kept"] for r in out}
    assert got == model
    assert len(out) == len(vecs)

    if mode == "greedy":
        # contract guarantee: kept rows pairwise below tau per cluster
        tau = 1.0 - eps
        by_cluster: dict[int, list] = {}
        for r in out:
            if r["kept"]:
                by_cluster.setdefault(r["centroid_id"], []).append(
                    r["doc_id"]
                )
        X = np.array(vecs, dtype=np.float64)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        Xn = X / nrm
        for ids in by_cluster.values():
            for a in range(len(ids)):
                for b in range(a + 1, len(ids)):
                    assert Xn[ids[a]] @ Xn[ids[b]] < tau
