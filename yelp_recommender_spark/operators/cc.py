"""Connected components over a pair list — duplicate-CLUSTER resolution,
the step after pair generation that actual dedup needs: near-dup pairs
(from MinHash-LSH / blocked Jaccard / embedding cosine) form a graph, and
"keep one copy" means "keep one representative per connected component",
not "drop the right-hand side of every pair" (pairwise dropping is
order-dependent and over-deletes on chains A~B~C).

The reference stops at pair/neighbor lists (its LSH machinery feeds CF
weights, ``/root/reference/utils/lsh.py:23-40``); component resolution is
part of the beyond-reference LLM-data-pipeline surface (brief: dedup as a
first-class component).

Algorithm: iterative min-label propagation (each node adopts the minimum
label in its closed neighborhood until fixpoint). Per iteration: one
shuffle-join (edges × labels) + one hash-agg — converges in
O(eccentricity of the min-id node) rounds, which for dedup graphs
(near-clique clusters of mutual near-duplicates, diameter ≲ 3) is a
handful. For adversarial long-chain graphs the published upgrade is the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — O(log n) rounds); the
label-propagation loop is chosen because dedup graphs are shallow and
every round is plain DataFrame algebra a SQL oracle can replay.

Scale notes:
- each round shuffles on node id (uniform keys); the edge table is
  persisted once and reused every round;
- ``localCheckpoint`` truncates the iteration's lineage so the logical
  plan does not grow linearly with rounds (an unbounded plan is a
  driver-memory leak and re-analysis cost at every action);
- the fixpoint test is an early-exit ``limit(1).count()`` over
  strictly-decreased labels — it stops scanning at the first change, so
  a non-converged round pays O(first change found), not a full compare;
- the label table holds only nodes that occur in ≥1 pair (duplicate
  clusters are a small fraction of any real corpus), so the per-round
  checkpointed footprint stays far below corpus size.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    id_out: str = "id",
    comp_out: str = "component",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id reachable from ``id``
    (deterministic canonical representative).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds (the result would silently be wrong for any
    component whose min-id is further than ``max_iter`` hops away).
    """
    # symmetrize via explode, not union-of-two-selects: a union scans the
    # upstream pair pipeline twice (expensive when `edges` is an unpersisted
    # LSH/verify plan); explode emits both directions in one pass
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for it in range(max_iter):
        # messages: every node's label, delivered to each neighbor
        msgs = sym.join(labels.withColumnRenamed("id", "a"), "a").select(
            F.col("b").alias("id"), "comp"
        )
        new = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        ).localCheckpoint()  # truncate lineage; eager, so `new` is live
        # fixpoint test: any label strictly decreased this round?
        changed = (
            new.join(labels.withColumnRenamed("comp", "_old"), "id")
            .filter(F.col("comp") < F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            logger.info("connected_components: converged in %d rounds", it + 1)
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds"
            " — raise max_iter (or switch to the large-star/small-star"
            " variant for long-chain graphs)"
        )
    return labels.select(
        F.col("id").alias(id_out), F.col("comp").alias(comp_out)
    )


def dedup_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 50,
) -> DataFrame:
    """Canonical-copy assignment for a whole corpus: every doc mapped to
    the representative (min doc id) of its duplicate cluster — docs in no
    pair are their own representative. ``keep = (doc_id == representative)``
    is then the corpus-wide dedup filter.

    Scale: one left join of the corpus against the (small — only nodes
    that occur in pairs) component table."""
    comps = connected_components(
        pairs, src=src, dst=dst, id_out=id_col, comp_out="_comp", max_iter=max_iter
    )
    return docs.select(id_col).join(comps, id_col, "left").select(
        id_col,
        F.coalesce("_comp", F.col(id_col)).alias("representative"),
    )
