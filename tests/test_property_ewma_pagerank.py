"""Property-based exactness checks (hypothesis) for the two numeric
recurrence operators: grouped EWMA (Arrow grouped-map) against a plain
Python fold of the adjust=False recurrence, and PageRank against a
Python power-iteration replay of the documented update rule —
including duplicate edges (which weight contributions), dangling
nodes (whose mass is dropped, not redistributed), and sink-only nodes
(teleport floor). Floats compare at 1e-9 absolute (summation order)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

series_st = st.dictionaries(
    st.integers(0, 15),  # unique order key per key-group
    st.integers(-4, 4),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=series_st,
    b=series_st,
    alpha=st.sampled_from([0.1, 0.5, 1.0]),
)
def test_ewma_matches_python_fold(spark, a, b, alpha):  # noqa: F811
    from yelp_recommender_spark.operators.ewma import ewma_by_key

    rows = [("a", t, float(v)) for t, v in a.items()] + [
        ("b", t, float(v)) for t, v in b.items()
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        (r.k, r.t): r.ewma
        for r in ewma_by_key(df, ["k"], "t", "v", alpha).collect()
    }
    for key, series in (("a", a), ("b", b)):
        y = None
        for t in sorted(series):
            x = float(series[t])
            y = x if y is None else (1.0 - alpha) * y + alpha * x
            assert abs(got[(key, t)] - y) < 1e-9, (key, t)


edges_st = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)),
    min_size=1,
    max_size=10,
)


def _brute_pagerank(edges, damping, iters):
    nodes = {n for e in edges for n in e}
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iters):
        contrib = {n: 0.0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / out_deg[s]
        rank = {
            n: (1.0 - damping) + damping * contrib[n] for n in nodes
        }
    return rank


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_st, iters=st.sampled_from([0, 1, 3]))
def test_pagerank_matches_power_iteration(spark, edges, iters):  # noqa: F811
    from yelp_recommender_spark.operators.pagerank import pagerank

    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(edf, iters=iters).collect()}
    want = _brute_pagerank(edges, 0.85, iters)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n
