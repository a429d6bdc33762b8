"""Hierarchy traversal — the WITH RECURSIVE gap: Spark SQL has no
recursive CTE, so ancestor/descendant closures (org charts, BOM
explosions, category trees) are expressed as an iterative join loop,
exactly like :mod:`~yelp_recommender_spark.operators.cc` and
:mod:`~yelp_recommender_spark.operators.pagerank` express their
fixpoints.

``ancestors`` computes the transitive closure of a child→parent edge set
with hop depth. The loop joins the current FRONTIER (paths discovered in
the previous round only — not the whole closure) against the edge table,
so each round's join is |frontier|·avg-fanout, and the loop ends when a
round adds nothing; for a forest of height h that is h rounds. Cycles
are cut by bounding rounds at ``max_depth`` (a closure over a cyclic
graph would otherwise never converge and is almost always a data bug —
the caller gets the partial closure plus the knowledge that the bound
was hit).

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
) -> DataFrame:
    """Transitive closure (node, ancestor, depth), depth ≥ 1, of a
    child→parent edge table. Depth 1 rows are the edges themselves."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    e = (
        edges.select(
            F.col(child).alias("node"), F.col(parent).alias("anc")
        )
        .distinct()
        .repartition("anc")
        .persist()
    )
    closure = e.withColumn("depth", F.lit(1))
    frontier = closure
    for _ in range(max_depth - 1):
        # extend last round's paths by one hop: frontier.anc == e.node
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
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    e.unpersist()
    # a DAG (diamond) can reach an ancestor via several paths — keep the
    # shortest, making the result a relation, not a path multiset
    return closure.groupBy("node", "anc").agg(
        F.min("depth").alias("depth")
    )
