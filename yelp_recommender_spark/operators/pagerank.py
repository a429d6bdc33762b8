"""PageRank — the iterative-fixpoint companion to connected components
(:mod:`yelp_recommender_spark.operators.cc`): importance scores over a
directed graph by repeated sparse matrix-vector products expressed as
join + aggregate.

Formulation (unnormalized, scores O(1)): every node starts at 1.0 and

    r_{k+1}(v) = (1 - d) + d · Σ_{(u,v) ∈ E} r_k(u) / out_deg(u)

Dangling nodes (no out-edges) simply contribute nothing — the standard
simplification when the caller symmetrizes or the graph has none; the
docstring of the catalog query states which.

Scale: the edge table is partitioned ONCE and persisted, with the layout
chosen by the rank-vector strategy — on dst when the vector broadcasts
(map-side join, aggregate reuses the layout: shuffle-free iterations) and
on src when it doesn't (the join reuses the persisted edge partitions;
only the rank vector and the post-partial-agg contribution stream move —
never the edges). ``localCheckpoint`` every few iterations truncates the
growing lineage (the same guard cc.py uses) — without it plan size and
scheduler overhead grow linearly in k. Per iteration: one join + one
aggregate, both keyed — no driver-side state beyond loop control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Broadcast-path gate: ranks broadcast per iteration only while
# |nodes| × bytes/row stays under the ceiling. 48 bytes covers the
# (long id, double rank) row plus broadcast HashedRelation overhead;
# 32 MB keeps the ceiling at ~700k nodes — a billion-node graph takes
# the shuffled-rank path. Module-level so tests can force either path.
_BYTES_PER_RANK_ROW = 48
_BCAST_RANKS_CEILING_BYTES = 32 << 20


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 3,
    edge_rows_per_partition: int = 250_000,
) -> DataFrame:
    """Rank every node appearing in ``edges`` (as source or target).
    Returns (id, rank). Deterministic up to float summation order —
    consumers comparing across engines should round (the q109 oracle
    rounds to 1e-6; per-iteration drift is ~1e-15 relative).

    ``edge_rows_per_partition`` sizes the persisted edge layout from the
    DATA instead of the session's shuffle-partition count: every
    iteration re-scans the cached edges, so per-task row counts too
    small to amortize task scheduling are paid ``iters`` times over
    (interleaved A/B at sf0.1, 1.07M edges ×8 iterations: 4–8
    partitions beat the 32 the session default produced in every paired
    pass). Edge rows are three fixed-width longs, so the row target is
    a stable byte target (~8 MB); deployments preferring larger cluster
    partitions raise it — the count it needs comes free off the
    out-degree aggregate the edge build reuses."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    out_deg = (
        edges.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg")).persist()
    )
    # exact |edges| off the out-degree cache (one tiny agg over
    # |src-nodes| rows; the expensive edges scan it triggers builds the
    # cache the e-join below reuses, so no extra pass over the edges)
    n_edges = (
        out_deg.agg(F.sum("out_deg").alias("m")).collect()[0]["m"] or 0
    )
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Strategy gate on the EXACT node count — nodes is already eagerly
    # materialized by the localCheckpoint, so count() is one cheap job
    # over stored blocks, never a recompute. Plan-stats sizing
    # (estimated_size_bytes) is wrong here by construction: a
    # checkpointed frame reports its ORIGIN lineage's product estimate
    # (the orders⋈lineitem distinct — ~1.5e14 "bytes" for a 160k-row
    # frame at the amplified sf1), which mis-routed every bench scale
    # onto the big-graph path (measured 2× slower at sf1: 27.8 s vs
    # 13.3 s broadcast, interleaved min-of-2). 48 bytes/node covers the
    # (long id, double rank) row plus broadcast HashedRelation overhead,
    # so the 32 MB cut keeps the broadcast ceiling unchanged (~700k
    # nodes); a billion-node graph still takes the shuffle path.
    n_nodes = nodes.count()
    small_ranks = (
        n_nodes * _BYTES_PER_RANK_ROW <= _BCAST_RANKS_CEILING_BYTES
    )
    # Edge layout follows the rank-vector strategy (ADVICE r4): with a
    # BROADCAST rank vector the join is map-side wherever e lives, so
    # partition on _dst — the contribution aggregate then reuses it and
    # the whole iteration is shuffle-free. With a too-large-to-broadcast
    # vector (the 100-TB graph case) the join itself needs _src
    # co-location: partition on _src ONCE so every iteration reuses the
    # persisted edge partitions and shuffles only the rank vector in and
    # the (≤ one row per in-edge-bearing node after partial aggs)
    # contribution stream out — never the edges.
    n_parts = int(
        max(2, -(-n_edges // max(int(edge_rows_per_partition), 1)))
    )
    e = (
        edges.join(out_deg, src)
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"), "out_deg")
        .repartition(n_parts, "_dst" if small_ranks else "_src")
        .persist()
    )
    teleport = 1.0 - damping
    ranks = nodes.withColumn("rank", F.lit(1.0).cast(T.DoubleType()))
    for i in range(iters):
        r = F.broadcast(ranks) if small_ranks else ranks
        contribs = (
            e.join(r, e["_src"] == ranks["id"])
            .select(
                F.col("_dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        # left-outer broadcast-hash requires the BUILD (right) side
        # hinted — contribs is ≤ |nodes| rows after its aggregate
        if small_ranks:
            contribs = F.broadcast(contribs)
        ranks = nodes.join(contribs, "id", "left").select(
            "id",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    if iters > 0:
        # materialize before dropping the cached edges: the returned
        # frame must not lazily re-derive k iterations from cold edges
        ranks = ranks.localCheckpoint(eager=True)
    e.unpersist()
    out_deg.unpersist()
    return ranks
