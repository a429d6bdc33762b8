"""Semantic deduplication: cluster-then-prune over an embedding column
(SemDeDup, Abbas et al. 2023, arXiv:2303.09540).

The pairwise near-dup family (`operators/ann.py`) answers "which PAIRS
are near-duplicates" — its cost is driven by the pair structure of the
corpus. SemDeDup answers the curation question directly — "which ROWS
do I keep" — by making the quadratic term local: k-means the embeddings
into K clusters, then prune ONLY within each cluster, keeping per group
of semantic duplicates the example FARTHEST from its cluster centroid
(the paper's rule: centroid-near members of a duplicate group are the
prototypical/redundant ones; the far member adds the most spread).

Scale shape (the reason this exists as a separate operator):

- Clustering reuses :func:`ivf_fit_assign` — seeded Lloyd on a bounded
  deterministic pseudorandom sample (driver-side, O(sample_n·K·dim)
  regardless of corpus size) followed by ONE map-only Arrow assignment
  pass with the (K × dim) center matrix in the task closure. No
  distributed iteration ever touches the full corpus.
- Pruning is ONE shuffle (groupBy centroid_id) + a per-cluster numpy
  kernel: O(Σ |c|²·d) ≈ O(n²·d/K) total COMPUTE, embarrassingly
  parallel across clusters, and the kernels never materialize an
  (n × n) matrix — the matrix mode scores in O(block · |c|) slabs and
  the greedy mode dots each row against the kept set on demand, so
  peak task memory is O(block · |c|) ≈ 0.4 GB at the cap. K is the
  knob that keeps |c| bounded — size it as K ≈ n /
  target_cluster_rows (the paper uses |c| ≈ 10⁴-10⁵ at billion-row
  scale). ``max_cluster_rows`` fails fast inside the kernel, before
  any quadratic compute, if a cluster blows the budget (re-run with
  larger K; k-means on normalized embeddings has no adversarial whale
  key the way a string groupBy does, so in practice the clusters are
  balanced).
- The verdict is O(n) rows — never a pair table.

Determinism: the quantizer fit is bit-deterministic (seeded Lloyd on a
deterministic sample), assignment is an exact argmin, and each cluster's
kernel runs single-group in one task with a fixed (centroid_sim desc,
id asc) processing order — so verdicts are partition-layout-independent,
with the same <1-ulp boundary caveat as the whole cosine family
(`cosine_pairs_above`): a pair whose cosine sits within ~1 ulp of the
threshold is shape-dependent because BLAS summation order varies.

No reference counterpart — the reference (jorgeviz/yelp_recommender)
has no embedding dedup at all; this is part of the engine's
LLM-data-pipeline family (SURVEY §6 / BASELINE "LLM-data-pipeline
operators").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["semantic_dedup"]


def semantic_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    n_clusters: int = 64,
    eps: float = 0.07,
    seed: int = 42,
    max_iter: int = 8,
    sample_n: int = 65_536,
    max_cluster_rows: int = 100_000,
    mode: str = "greedy",
) -> DataFrame:
    """Per-row keep/drop verdicts for cluster-local semantic dedup.

    Within each k-means cluster, rows are processed from FARTHEST to
    nearest to the centroid (ties on id ascending); a row is KEPT iff
    its max cosine to every already-kept row of the cluster is
    < ``1 - eps``. The farthest member of any duplicate group is
    therefore always kept and its centroid-nearer near-duplicates
    dropped — the SemDeDup §3 rule. Cross-cluster near-duplicates are
    out of contract by design (the paper's stated approximation); the
    pairwise family is the tool when cross-partition exactness matters.

    Chaining vs the paper: the kept set is the greedy maximal prefix —
    a row is compared against KEPT rows only, so a chain a~b, b~c with
    cos(a,c) < 1-eps keeps both a and c (b dropped). This is the
    deterministic transitive-chain behavior; the paper's matrix form
    (max over ALL prior rows, kept or not) drops c too. The greedy form
    never drops a row whose nearest kept neighbor is below threshold,
    which is the stronger guarantee for training-set diversity.

    Returns (id_col, centroid_id int, centroid_sim double,
    max_kept_sim double, kept boolean) — one row per input row;
    ``centroid_sim``/``max_kept_sim`` rounded to 6 for engine-portable
    hashing (``max_kept_sim`` is NULL for the first-processed row of a
    cluster; the keep decision itself compares unrounded values).
    Callers keep ``filter(kept)`` rows; the dropped rows ARE the audit.

    ``mode="matrix"`` is the paper-faithful variant: a row's score is
    its max cosine to EVERY prior row in processing order (kept or
    dropped), fully batch-vectorized (masked row-max over the strict
    prior triangle — no per-row Python). It can drop a whole chain
    a~b~c even when cos(a, c) < 1-eps. The greedy kernel's per-row loop
    is NOT the r7 anti-pattern: each verdict depends on the set of
    previously KEPT rows, a genuinely sequential dependency (the inner
    max over kept rows is vectorized; the matrix mode exists for
    callers who want the loop-free kernel and accept chain-dropping).

    eps: 1 - cosine threshold (paper's ε; 0.07 ≈ cos 0.93). eps ≤ 0
    keeps everything except (up to float error) identical directions;
    eps ≥ 2 keeps exactly one row per cluster (cosine is ≥ -1).

    Rows with a NULL ``vec_col`` are "no vector" (the curate-stage
    convention): they come back ``kept=true`` with NULL centroid
    columns, never reaching the quantizer or the kernels. An input
    with ZERO non-null vectors raises ``ValueError`` (inherited from
    :func:`ivf_fit_assign` — there is nothing to cluster; guard
    upstream for maybe-empty inputs).
    """
    if not 0 < n_clusters:
        raise ValueError(f"n_clusters must be positive, got {n_clusters}")
    if max_cluster_rows < 1:
        raise ValueError(
            f"max_cluster_rows must be positive, got {max_cluster_rows}"
        )
    if mode not in ("greedy", "matrix"):
        raise ValueError(f"mode must be 'greedy' or 'matrix', got {mode!r}")
    from yelp_recommender_spark.operators.ann import ivf_fit_assign

    nullvec = df.filter(F.col(vec_col).isNull()).select(
        id_col,
        F.lit(None).cast("int").alias("centroid_id"),
        F.lit(None).cast("double").alias("centroid_sim"),
        F.lit(None).cast("double").alias("max_kept_sim"),
        F.lit(True).alias("kept"),
    )
    assigned, centers = ivf_fit_assign(
        df.filter(F.col(vec_col).isNotNull()),
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_clusters,
        seed=seed,
        max_iter=max_iter,
        sample_n=sample_n,
    )
    # normalize the centers once, driver-side: centroid_sim is then a
    # plain dot product against the already-normalized member vectors
    C = np.asarray(centers, dtype=np.float64)
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    cn[cn == 0.0] = 1.0
    C = C / cn

    tau = 1.0 - float(eps)
    cap = int(max_cluster_rows)
    id_type = assigned.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, centroid_id int, centroid_sim double, "
        "max_kept_sim double, kept boolean"
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if not n:
            return pd.DataFrame(
                columns=[
                    id_col, "centroid_id", "centroid_sim",
                    "max_kept_sim", "kept",
                ]
            )
        cid = int(pdf["centroid_id"].iloc[0])
        if n > cap:
            raise ValueError(
                f"semantic_dedup: cluster {cid} has {n} rows > "
                f"max_cluster_rows={cap}; re-run with n_clusters "
                f"sized ~ n_rows / target_cluster_rows"
            )
        X = np.array(pdf["vec"].to_list(), dtype=np.float64)
        csim = X @ C[cid]
        # farthest-from-centroid first; id ascending breaks ties so
        # the order (and thus every verdict) is layout-independent
        order = np.lexsort((pdf[id_col].to_numpy(), csim))
        Xo = X[order]
        # Never materialize the (n × n) similarity matrix: peak kernel
        # memory is O(block · n) regardless of cluster size, so the
        # cap bounds COMPUTE (n²·d/2 flops), not an allocation.
        blk = 512  # peak S_blk = blk · n · 8 B ≈ 0.4 GB at the cap
        kept = np.zeros(n, dtype=bool)
        max_kept = np.full(n, np.nan)
        if mode == "matrix":
            # paper form: per block, row-max over the strict prior
            # triangle — batch-vectorized, no per-row Python
            for a in range(0, n, blk):
                b_end = min(a + blk, n)
                S_blk = Xo[a:b_end] @ Xo[:b_end].T  # (B × b_end)
                rows = np.arange(a, b_end)[:, None]
                S_blk[np.arange(b_end)[None, :] >= rows] = -np.inf
                M = S_blk.max(axis=1)
                max_kept[a:b_end] = M
                kept[a:b_end] = M < tau
            kept[0] = True
            max_kept[0] = np.nan
        else:
            kept_rows: list[int] = []
            for i in range(n):
                if kept_rows:
                    # on-demand dot against the kept set only: the
                    # greedy dependency is sequential anyway, and this
                    # never allocates beyond O(|kept| · d)
                    m = (Xo[kept_rows] @ Xo[i]).max()
                    max_kept[i] = m
                    if m >= tau:
                        continue
                kept[i] = True
                kept_rows.append(i)
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "centroid_id": pdf["centroid_id"],
                "centroid_sim": np.round(csim, 6),
                "max_kept_sim": np.round(max_kept[inv], 6),
                "kept": kept[inv],
            }
        )

    verdicts = assigned.groupBy("centroid_id").applyInPandas(
        prune, out_schema
    )
    return verdicts.unionByName(nullvec)
