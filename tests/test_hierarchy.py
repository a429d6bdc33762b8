"""Hierarchy closure (operators/hierarchy.py): chain depths, diamond
shortest-path, cycle bounding, and parameter validation."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def _closure(spark, rows, **kw):
    from yelp_recommender_spark.operators.hierarchy import ancestors

    edges = spark.createDataFrame(rows, "child long, parent long")
    return {
        (r.node, r.anc): r.depth for r in ancestors(edges, **kw).collect()
    }


def test_chain_full_depths(spark):  # noqa: F811
    got = _closure(spark, [(3, 2), (2, 1), (1, 0)])
    assert got == {
        (3, 2): 1, (3, 1): 2, (3, 0): 3,
        (2, 1): 1, (2, 0): 2,
        (1, 0): 1,
    }


def test_diamond_keeps_shortest_depth(spark):  # noqa: F811
    # 4 → {2, 3} → 1 and also 4 → 1 directly: depth(4,1) must be 1
    got = _closure(spark, [(4, 2), (4, 3), (4, 1), (2, 1), (3, 1)])
    assert got[(4, 1)] == 1
    assert got[(4, 2)] == got[(4, 3)] == 1
    assert got[(2, 1)] == got[(3, 1)] == 1
    assert len(got) == 5


def test_cycle_is_bounded_not_infinite(spark):  # noqa: F811
    got = _closure(spark, [(1, 2), (2, 1)], max_depth=5)
    # closure over the 2-cycle at bound 5: self-paths collapse to the
    # minimal depths (each node reaches the other at 1, itself at 2)
    assert got[(1, 2)] == 1 and got[(2, 1)] == 1
    assert got[(1, 1)] == 2 and got[(2, 2)] == 2
    assert len(got) == 4  # bounded — did not run away


def test_max_depth_validation(spark):  # noqa: F811
    with pytest.raises(ValueError):
        _closure(spark, [(1, 0)], max_depth=0)


def test_braided_dag_frontier_stays_polynomial(spark):  # noqa: F811
    """A braided lattice (every node has 2 parents) has exponentially
    many PATHS but a tiny closure — the BFS frontier dedup must keep
    rounds bounded by the closure, not the path multiset (review fix)."""
    depth = 12
    rows = []
    for i in range(depth):
        for side in ("a", "b"):
            for parent_side in ("a", "b"):
                rows.append((f"{side}{i}", f"{parent_side}{i + 1}"))
    from yelp_recommender_spark.operators.hierarchy import ancestors

    edges = spark.createDataFrame(rows, "child string, parent string")
    got = ancestors(edges, max_depth=depth + 2).collect()
    # closure: every node reaches BOTH nodes of every higher layer once
    expect = sum(2 * 2 * (depth - i) for i in range(depth))
    assert len(got) == expect
    # spot-check shortest depth through the braid
    d = {(r.node, r.anc): r.depth for r in got}
    assert d[("a0", "b12")] == 12


def test_hierarchy_no_recompute_after_return(spark):  # noqa: F811
    """The returned closure must be checkpoint-backed: collecting it
    twice after the operator unpersisted its edge cache is safe and
    consistent (review fix)."""
    from yelp_recommender_spark.operators.hierarchy import ancestors

    edges = spark.createDataFrame([(2, 1), (1, 0)], "child long, parent long")
    out = ancestors(edges)
    assert out.count() == out.count() == 3
