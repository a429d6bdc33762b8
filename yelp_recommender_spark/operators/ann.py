"""Similarity search over embedding columns (LLM-data-pipeline surface;
generalization of the reference's brute k-NN over ALS item factors,
``/root/reference/scripts/als_recommender.py:139-153`` — which collected
factors to the driver and ran sklearn. Here the *index* side is broadcast
(bounded, documented) and the *query* side streams through a vectorized
Arrow batch — the standard Spark ANN-index pattern).

Three tiers:

1. :func:`cosine_pairs_above` / :func:`cosine_topk` — exact brute force,
   numpy matmul per Arrow batch via ``mapInPandas``. The broadcast index
   costs 8·N·dim bytes; fine up to ~10M×128-dim vectors per executor.
2. :func:`lsh_bucket_candidates` — sign-random-projection (SimHash-for-
   vectors) bucketing as Column algebra; restricts the matmul to bucket
   collisions. The scale path when the index no longer broadcasts: both
   sides shuffle on the bucket key instead.
3. For completeness, exact per-row cosine as a Column expression lives in
   :mod:`yelp_recommender_spark.functions.similarity` (fine for joined
   pairs; never use it for all-pairs scans).

Determinism: all float math is float64; scores are rounded to 6 digits at
the operator boundary so results hash identically across engines and
partitionings (summation-order error ~1e-15 ≪ 5e-7).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalized_index(
    index_df: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Collect the index side as (ids, L2-normalized float64 matrix).

    This is the one deliberate driver materialization in the engine: an
    ANN index must be resident *somewhere*; broadcasting it to executors
    is the distributed-systems equivalent of building the index once.
    """
    rows = index_df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0  # zero vectors → cosine 0 against everything
    return ids, mat / norms


def cosine_pairs_above(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """All (id1 < id2) pairs with cosine ≥ threshold — embedding near-dup
    detection. Index = the whole table (broadcast); query side streams.

    Output: (id1, id2, cos) with cos rounded to 6.
    """
    spark = df.sparkSession
    ids, mat = _normalized_index(df, id_col, vec_col)
    b = spark.sparkContext.broadcast((ids, mat))

    schema = T.StructType(
        [
            T.StructField("id1", T.LongType()),
            T.StructField("id2", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_ids, idx_mat = b.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            sims = (q / qn) @ idx_mat.T  # (batch, N) float64 matmul
            qi, ii = np.nonzero(sims >= threshold)
            a, bb = q_ids[qi], idx_ids[ii]
            keep = a < bb  # ordered-pair dedup (P6)
            yield pd.DataFrame(
                {
                    "id1": a[keep],
                    "id2": bb[keep],
                    "cos": np.round(sims[qi[keep], ii[keep]], 6),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def cosine_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (self-matches
    excluded). Output: (query_id, neighbor_id, cos, rank).

    Rank ties break on neighbor_id asc (deterministic — SURVEY §7 risk
    register). The top-k select is argpartition (O(N) per query) + a small
    sort of k candidates.
    """
    spark = queries.sparkSession
    ids, mat = _normalized_index(index, id_col, vec_col)
    b = spark.sparkContext.broadcast((ids, mat))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_ids, idx_mat = b.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            sims = (q / qn) @ idx_mat.T
            out_q, out_n, out_c, out_r = [], [], [], []
            for row in range(sims.shape[0]):
                s = np.round(sims[row], 6)
                mask = idx_ids != q_ids[row]
                cand_ids, cand_s = idx_ids[mask], s[mask]
                take = min(k, cand_s.shape[0])
                if take == 0:
                    continue
                part = np.argpartition(-cand_s, take - 1)[:take]
                # sort by (-cos, id) for deterministic ranks
                order = np.lexsort((cand_ids[part], -cand_s[part]))
                sel = part[order]
                out_q.extend([q_ids[row]] * take)
                out_n.extend(cand_ids[sel])
                out_c.extend(cand_s[sel])
                out_r.extend(range(1, take + 1))
            yield pd.DataFrame(
                {
                    "query_id": np.array(out_q, dtype=np.int64),
                    "neighbor_id": np.array(out_n, dtype=np.int64),
                    "cos": np.array(out_c, dtype=np.float64),
                    "rank": np.array(out_r, dtype=np.int32),
                }
            )

    return queries.select(id_col, vec_col).mapInPandas(gen, schema)


# --------------------------------------------------------------------------
# LSH (sign random projection) — the beyond-broadcast scale path
# --------------------------------------------------------------------------
def srp_bucket(
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> "F.Column":
    """Sign-random-projection bucket id (0..2^n_planes-1) as a Column.

    Hyperplanes are deterministic pseudo-randoms derived from (seed,
    plane, dim) via a hash — identical on every executor with no
    broadcast at all. Two vectors land in the same bucket iff they agree
    on the sign of all ``n_planes`` projections; P(collision) =
    (1 - θ/π)^n_planes.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    acc = F.lit(0)
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(float(x)) for x in planes[p]])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        acc = acc + F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return acc


def lsh_bucket_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs whose vectors share an SRP bucket in ≥ 1 of
    ``n_tables`` independent tables (OR-amplification, the same banding
    idea as MinHash-LSH). Returns distinct (id1 < id2) pairs.

    Scale: no broadcast index — both sides shuffle on (table, bucket).
    Feed the result to an exact re-scorer (cosine on joined vectors)."""
    keyed = df.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{t}#"),
                        srp_bucket(vec_col, n_planes, dim, seed + t).cast(
                            "string"
                        ),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("bucket"),
    )
    a = keyed.select(F.col(id_col).alias("id1"), "bucket")
    b = keyed.select(F.col(id_col).alias("id2"), "bucket")
    return (
        a.join(b, (a.bucket == b.bucket) & (F.col("id1") < F.col("id2")))
        .select("id1", "id2")
        .distinct()
    )


# --------------------------------------------------------------------------
# planner: broadcast-matmul vs LSH by index cardinality (SURVEY §4 item 1)
# --------------------------------------------------------------------------
# ~5M rows × 64-dim float64 ≈ 2.5 GB broadcast — the practical ceiling for
# a comfortable executor-resident index; beyond it the plan must shuffle.
DEFAULT_BROADCAST_INDEX_LIMIT = 5_000_000


def cosine_pairs_above_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Beyond-broadcast near-dup pairs: SRP-LSH candidates re-scored with
    the exact array cosine, filtered at the threshold. Same output
    contract as :func:`cosine_pairs_above` (id1 < id2, cos rounded 6);
    recall < 1 is possible for pairs barely above the threshold — the
    collision probability (1-θ/π)^n_planes amplified over ``n_tables``
    tables is ≈ 1 only for genuinely-close vectors, which is the regime
    this operator is for.

    Scale: candidates shuffle on (table, bucket); the re-score joins the
    vector table twice on id. No broadcast, no driver state."""
    from yelp_recommender_spark.functions.similarity import cosine_arrays

    dim = len(df.select(vec_col).head()[0])
    cand = lsh_bucket_candidates(
        df, id_col, vec_col, n_planes=n_planes, dim=dim,
        n_tables=n_tables, seed=seed,
    )
    v1 = df.select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).cast("array<double>").alias("_v1"),
    )
    v2 = df.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).cast("array<double>").alias("_v2"),
    )
    return (
        cand.join(v1, "id1")
        .join(v2, "id2")
        .withColumn("cos", F.round(cosine_arrays("_v1", "_v2"), 6))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


def cosine_pairs_above_auto(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    broadcast_limit: int = DEFAULT_BROADCAST_INDEX_LIMIT,
    n_planes: int = 6,
    n_tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Cardinality-based similarity-join planner: broadcast-index matmul
    (:func:`cosine_pairs_above`, exact) while the index fits an executor
    (≤ ``broadcast_limit`` rows), SRP-LSH + exact re-score
    (:func:`cosine_pairs_above_lsh`) beyond it. The count() that drives
    the decision is a column-pruned scan — the same cardinality probe a
    cost-based optimizer would issue."""
    n = df.count()
    if n <= broadcast_limit:
        return cosine_pairs_above(df, id_col, vec_col, threshold)
    return cosine_pairs_above_lsh(
        df, id_col, vec_col, threshold,
        n_planes=n_planes, n_tables=n_tables, seed=seed,
    )
