"""Property-based exactness checks (hypothesis) for the two stateful
maintenance operators with the most sequence-dependent edge geometry:
SCD2 merge (chained batches: same-value no-ops, NULL-safe attribute
compare, flip-flop re-changes, closed-key drops) against a plain-Python
history model, and hierarchy transitive closure (random graphs including
cycles and diamonds) against BFS shortest-path distances."""

from __future__ import annotations

from collections import deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

KEYS = ["k1", "k2", "k3", "k4"]

# a batch maps key -> attribute value (None exercises the NULL-safe
# compare); a run is 1-3 batches applied at ts = 10, 20, 30
batch_st = st.dictionaries(
    st.sampled_from(KEYS),
    st.one_of(st.none(), st.integers(0, 2)),
    min_size=0,
    max_size=4,
)
batches_st = st.lists(batch_st, min_size=1, max_size=3)


def _nullsafe_key(row):
    """Total order over rows whose attr / valid_to may be None."""
    return tuple((v is None, v if v is not None else 0) for v in row)


def _model_scd2(batches, seed_rows=()):
    """Replay the documented row fates in plain Python.

    rows: list of [key, attr, valid_from, valid_to]; open = vt is None.
    """
    rows = [list(r) for r in seed_rows]
    for i, batch in enumerate(batches):
        ts = 10 * (i + 1)
        keys_ever = {r[0] for r in rows}
        for k, v in batch.items():
            open_rows = [r for r in rows if r[0] == k and r[3] is None]
            if open_rows:
                (r,) = open_rows
                if r[1] != v:  # NULL-safe: None == None is a no-op
                    r[3] = ts
                    rows.append([k, v, ts, None])
            elif k not in keys_ever:
                rows.append([k, v, ts, None])
            # else: key exists but fully closed -> dropped by contract
    return sorted((tuple(r) for r in rows), key=_nullsafe_key)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches_st, close_first=st.booleans())
def test_scd2_chained_batches_match_model(spark, batches, close_first):  # noqa: F811
    from yelp_recommender_spark.operators.scd import scd2_merge

    schema = "k string, a long, valid_from long, valid_to long"
    seed_rows = []
    if close_first:
        # a pre-closed key with no open row: updates to it must drop
        seed_rows = [("k1", 99, 1, 2)]
        batches = [{"k1": 0, **batches[0]}, *batches[1:]]
    dim = spark.createDataFrame(seed_rows, schema)
    for i, batch in enumerate(batches):
        upd = spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "k string, a long"
        )
        # truncate lineage between batches (the production maintenance
        # loop writes each snapshot out; unbounded plan nesting here
        # would only measure analyzer cost, not the operator)
        dim = scd2_merge(
            dim, upd, ["k"], ["a"], batch_ts=10 * (i + 1)
        ).localCheckpoint(eager=True)
    got = sorted(
        ((r.k, r.a, r.valid_from, r.valid_to) for r in dim.collect()),
        key=_nullsafe_key,
    )
    assert got == _model_scd2(batches, seed_rows)


edges_st = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=12,
)


def _bfs_closure(edges, max_depth):
    """(node, ancestor, shortest-hop-distance) for distances 1..max_depth."""
    adj = {}
    for c, p in edges:
        adj.setdefault(c, set()).add(p)
    out = {}
    for start in {n for e in edges for n in e}:
        dist = {}
        q = deque([(start, 0)])
        while q:
            n, d = q.popleft()
            if d >= max_depth:
                continue
            for p in adj.get(n, ()):
                if p not in dist:
                    dist[p] = d + 1
                    q.append((p, d + 1))
        for anc, d in dist.items():
            out[(start, anc)] = d
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_st, max_depth=st.sampled_from([1, 2, 4, 30]))
def test_hierarchy_closure_matches_bfs(spark, edges, max_depth):  # noqa: F811
    from yelp_recommender_spark.operators.hierarchy import ancestors

    edf = spark.createDataFrame(edges, "child long, parent long")
    got = {
        (r.node, r.anc): r.depth
        for r in ancestors(edf, max_depth=max_depth).collect()
    }
    assert got == _bfs_closure(edges, max_depth)
