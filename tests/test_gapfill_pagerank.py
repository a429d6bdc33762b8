"""Gap fill (operators/gapfill.py) and PageRank (operators/pagerank.py)
unit semantics on hand-computable fixtures."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def test_gap_fill_ffill_fills_and_carries(spark):  # noqa: F811
    from yelp_recommender_spark.operators.gapfill import gap_fill_ffill

    obs = spark.createDataFrame(
        [
            ("a", 0, 2, 10.0),
            ("a", 3, 1, 30.0),  # slots 1,2 missing
            ("b", 5, 4, 50.0),  # single-slot key
        ],
        "k string, t long, n long, v double",
    )
    out = gap_fill_ffill(obs, ["k"], "t", 1, ["v"], count_col="n")
    got = {(r.k, r.t): (r.n, r.v_ff) for r in out.collect()}
    assert got == {
        ("a", 0): (2, 10.0),
        ("a", 1): (0, 10.0),  # filled, carried forward
        ("a", 2): (0, 10.0),
        ("a", 3): (1, 30.0),
        ("b", 5): (4, 50.0),
    }


def test_gap_fill_respects_step(spark):  # noqa: F811
    from yelp_recommender_spark.operators.gapfill import gap_fill_ffill

    obs = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 6, 2.0)], "k string, t long, v double"
    )
    out = gap_fill_ffill(obs, ["k"], "t", 3, ["v"])
    assert sorted(r.t for r in out.collect()) == [0, 3, 6]


def test_pagerank_cycle_is_uniform(spark):  # noqa: F811
    from yelp_recommender_spark.operators.pagerank import pagerank

    # 3-cycle: every node has in=out=1 → rank stays exactly 1.0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    ranks = {r.id: r.rank for r in pagerank(edges, iters=5).collect()}
    assert ranks == {1: 1.0, 2: 1.0, 3: 1.0}


def test_pagerank_star_two_iterations_hand_computed(spark):  # noqa: F811
    from yelp_recommender_spark.operators.pagerank import pagerank

    # star: 2,3,4 each -> 1; 1 -> 2 (so no dangling source confusion)
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (1, 2)], "src long, dst long"
    )
    # iter1: r(1)=0.15+0.85*3=2.7; r(2)=0.15+0.85*1=1.0; r(3)=r(4)=0.15
    # iter2: r(1)=0.15+0.85*(1.0+0.15+0.15)=1.255; r(2)=0.15+0.85*2.7=2.445
    ranks = {r.id: r.rank for r in pagerank(edges, iters=2).collect()}
    assert ranks[1] == pytest.approx(0.15 + 0.85 * (1.0 + 0.15 + 0.15))
    assert ranks[2] == pytest.approx(0.15 + 0.85 * 2.7)
    assert ranks[3] == pytest.approx(0.15)
    assert ranks[4] == pytest.approx(0.15)


def test_pagerank_zero_iters_returns_init(spark):  # noqa: F811
    from yelp_recommender_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    ranks = {r.id: r.rank for r in pagerank(edges, iters=0).collect()}
    assert ranks == {1: 1.0, 2: 1.0}


def test_pagerank_large_graph_path_matches_broadcast_path(
    spark, monkeypatch
):  # noqa: F811
    """The non-broadcast (large-graph) code path — rank vector shuffled to
    the persisted _src edge layout instead of broadcast — must produce the
    same ranks as the broadcast path (ADVICE r4: the layout now follows
    the rank-vector strategy)."""
    import yelp_recommender_spark.operators.pagerank as pr

    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    small = {
        r.id: round(r.rank, 10) for r in pr.pagerank(edges, iters=4).collect()
    }
    # force the planner's "too large to broadcast" branch (the gate is
    # the exact node count against the module ceiling since r10 —
    # zeroing the ceiling routes ANY graph onto the shuffled-rank path)
    monkeypatch.setattr(pr, "_BCAST_RANKS_CEILING_BYTES", 0)
    big = {
        r.id: round(r.rank, 10) for r in pr.pagerank(edges, iters=4).collect()
    }
    assert small == big
