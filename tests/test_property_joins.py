"""Property-based exactness checks (hypothesis) for the join-family
operators whose semantics have the most edge geometry: backward as-of
join (tie-at-equal-ts, tolerance aging, missing-key nulls), bucketized
point-in-interval range join (bucket-boundary landings, degenerate
single-point intervals), and connected components (chains, cliques,
self-loops). Each is verified against a plain-Python brute force over
random draws — the same contract style as test_property_dedup."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

KEYS = ["a", "b"]

# (key, ts) pairs; right side must be unique per (key, ts) by operator
# contract, so right values are keyed dicts.
left_st = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 20)),
    min_size=1,
    max_size=8,
)
right_st = st.dictionaries(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 20)),
    st.integers(-5, 5),
    min_size=0,
    max_size=8,
)


def _brute_asof(left, right, tolerance):
    """Expected (key, lts, matched value|None) multiset."""
    out = []
    for k, lts in left:
        cands = [
            (rts, v) for (rk, rts), v in right.items() if rk == k and rts <= lts
        ]
        if not cands:
            out.append((k, lts, None))
            continue
        rts, v = max(cands)
        if tolerance is not None and lts - rts > tolerance:
            out.append((k, lts, None))
        else:
            out.append((k, lts, v))
    return sorted(out, key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_st, right=right_st, tolerance=st.sampled_from([None, 0, 3]))
def test_asof_join_matches_bruteforce(spark, left, right, tolerance):  # noqa: F811
    from yelp_recommender_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
    )

    ldf = spark.createDataFrame(
        [(k, ts) for k, ts in left], "k string, ts long"
    )
    rschema = "k string, ts long, v long"
    rrows = [(k, ts, v) for (k, ts), v in right.items()]
    rdf = spark.createDataFrame(rrows, rschema) if rrows else (
        spark.createDataFrame([], rschema)
    )
    want = _brute_asof(left, right, tolerance)
    for impl in (asof_join, asof_join_cogrouped):
        got = sorted(
            (
                (r.k, r.ts, r.v_asof)
                for r in impl(
                    ldf, rdf, ["k"], "ts", ["v"], tolerance=tolerance
                ).collect()
            ),
            key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0),
        )
        assert got == want, impl.__name__


points_st = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 30)),
    min_size=1,
    max_size=8,
)
intervals_st = st.lists(
    st.tuples(
        st.sampled_from(KEYS), st.integers(0, 30), st.integers(-2, 12)
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=points_st,
    intervals=intervals_st,
    width=st.sampled_from([None, 1, 2, 7]),
)
def test_range_join_matches_bruteforce(spark, points, intervals, width):  # noqa: F811
    from yelp_recommender_spark.operators.rangejoin import range_join_points

    pdf = spark.createDataFrame(
        [(k, p, i) for i, (k, p) in enumerate(points)],
        "k string, pt long, pid long",
    )
    ivs = [(k, s, s + dlen) for k, s, dlen in intervals]
    idf = spark.createDataFrame(
        [(k, s, e, j) for j, (k, s, e) in enumerate(ivs)],
        "k string, s long, e long, iid long",
    )
    want = sorted(
        (i, j)
        for i, (k, p) in enumerate(points)
        for j, (ik, s, e) in enumerate(ivs)
        if ik == k and s <= p <= e
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join_points(
            pdf, idf, ["k"], "pt", "s", "e", bucket_width=width
        ).collect()
    )
    assert got == want


edges_st = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1,
    max_size=14,
)


def _brute_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_st)
def test_connected_components_matches_union_find(spark, edges):  # noqa: F811
    from yelp_recommender_spark.operators.cc import connected_components

    edf = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {
        r.id: r.component for r in connected_components(edf).collect()
    }
    assert got == _brute_components(edges)
