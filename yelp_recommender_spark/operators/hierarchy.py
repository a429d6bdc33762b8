"""Hierarchy traversal — the WITH RECURSIVE gap: Spark SQL has no
recursive CTE, so ancestor/descendant closures (org charts, BOM
explosions, category trees) are expressed as an iterative join loop,
exactly like :mod:`~yelp_recommender_spark.operators.cc` and
:mod:`~yelp_recommender_spark.operators.pagerank` express their
fixpoints.

``ancestors`` computes the transitive closure of a child→parent edge set
with hop depth. The loop joins the current FRONTIER (pairs discovered in
the previous round only — not the whole closure) against the edge table,
then BFS-dedups: parallel paths collapse to one row per (node, anc) and
already-known pairs are anti-joined away. That keeps every round bounded
by |closure| even on braided DAGs whose raw PATH count is exponential,
makes first discovery = shortest depth, and lets cyclic graphs converge
naturally (everything reachable gets seen once); ``max_depth`` stays as
a hard bound against pathological data. For a forest of height h the
loop is h rounds.

Scale: edges are repartitioned on the child key once and persisted; each
round shuffles only the shrinking frontier; lineage is truncated with
``localCheckpoint`` per round (iterative-plan growth guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestors(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 30,
    edge_rows_per_partition: int = 250_000,
) -> DataFrame:
    """Transitive closure (node, ancestor, depth), depth ≥ 1, of a
    child→parent edge table. Depth 1 rows are the edges themselves.

    ``edge_rows_per_partition`` sizes the persisted edge layout from the
    DATA instead of the session's shuffle-partition count — every round
    re-probes the persisted edges, so per-task row counts too small to
    amortize task scheduling are paid ``height`` times over (the
    pagerank precedent: fixed-width rows make a row target a stable
    ~8 MB byte target; a 100 TB edge set sizes to |edges|/target
    partitions from the same rule)."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    d = (
        edges.select(
            F.col(child).alias("node"), F.col(parent).alias("anc")
        )
        .distinct()
        .persist()
    )
    # exact |edges| off the distinct cache (the loop needs the distinct
    # materialized anyway; the count is one cached-read aggregate)
    n_edges = d.count()
    n_parts = int(
        max(2, -(-n_edges // max(int(edge_rows_per_partition), 1)))
    )
    e = (
        # partitioned on the column each round's join PROBES (the hop
        # source, aliased to "anc" in the join below) so the persisted
        # layout is actually reused — partitioning survives the alias
        d.repartition(n_parts, "node")
        .persist()
    )
    closure = e.withColumn("depth", F.lit(1)).localCheckpoint(eager=True)
    d.unpersist()
    frontier = closure
    # the loop's OWN shuffles (per-round BFS-dedup aggregate + the
    # anti-join against the closure) run under a shuffle-partition
    # count sized like the edge layout instead of the session conf —
    # per-round task counts otherwise dwarf the shrinking frontier
    # (the connected-components rule; clamped to the session setting so
    # a big closure keeps full parallelism). Each round's result is
    # checkpoint-materialized inside the window; the returned union is
    # shuffle-free, so restoring the conf afterwards is safe.
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = min(int(prev_parts), max(n_parts, 2))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        for _ in range(max_depth - 1):
            # extend last round's paths by one hop: frontier.anc ==
            # e.node, then BFS-dedup the frontier — collapse parallel
            # paths to one row per (node, anc) and drop pairs the
            # closure already holds. Without this a braided DAG's path
            # count grows exponentially while its closure stays
            # O(nodes·height); with it each round is bounded by
            # |closure| and first discovery = shortest depth.
            nxt = (
                frontier.join(
                    e.select(
                        F.col("node").alias("anc"),
                        F.col("anc").alias("anc2"),
                    ),
                    "anc",
                )
                .select(
                    "node",
                    F.col("anc2").alias("anc"),
                    (F.col("depth") + 1).alias("depth"),
                )
                .groupBy("node", "anc")
                .agg(F.min("depth").alias("depth"))
                .join(closure, ["node", "anc"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            closure = closure.unionByName(nxt)
            frontier = nxt
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    e.unpersist()
    # every (node, anc) enters the closure exactly once, at its first
    # (= shortest) discovery depth — the result is already a relation
    return closure
