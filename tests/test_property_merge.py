"""Property-based checks (hypothesis) for the incremental-maintenance
operators: apply_cdc and merge_deltas are each verified against a plain
Python reference model over randomized feeds — the small hand fixtures
can't cover the combinatorics of op interleavings per key."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

KEYS = list(range(6))

base_st = st.dictionaries(
    st.sampled_from(KEYS), st.integers(0, 100), max_size=6
)
# change feed: (key, op, payload) in feed order; seq = position
feed_st = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["U", "D"]),
        st.integers(0, 100),
    ),
    max_size=12,
)


def _cdc_model(base: dict, feed: list) -> dict:
    last: dict = {}
    for seq, (k, op, v) in enumerate(feed):
        last[k] = (seq, op, v)
    snap = dict(base)
    for k, (_, op, v) in last.items():
        if op == "D":
            snap.pop(k, None)
        else:
            snap[k] = v
    return snap


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=base_st, feed=feed_st)
def test_apply_cdc_matches_model(spark, base, feed):  # noqa: F811
    from yelp_recommender_spark.operators.merge import apply_cdc

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(999, 0)], "k long, v long"
    )
    if not base:
        base_df = base_df.filter("k < 0")
    changes = spark.createDataFrame(
        [
            (k, op, seq, v if op == "U" else None)
            for seq, (k, op, v) in enumerate(feed)
        ]
        or [(999, "U", 0, 0)],
        "k long, op string, seq long, v long",
    )
    if not feed:
        changes = changes.filter("k < 0")
    got = {
        r.k: r.v for r in apply_cdc(base_df, changes, ["k"]).collect()
    }
    assert got == _cdc_model(base, feed)


def _agg_model(facts: list, deltas: list) -> dict:
    state: dict = defaultdict(lambda: [0, 0])
    for k, v in facts:
        state[k][0] += 1
        state[k][1] += v
    for k, v, sign in deltas:
        state[k][0] += sign
        state[k][1] += sign * v
    return {
        k: (n, s) for k, (n, s) in state.items() if n > 0
    }


facts_st = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50)), max_size=10
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(facts=facts_st, data=st.data())
def test_merge_deltas_matches_model(spark, facts, data):  # noqa: F811
    from yelp_recommender_spark.operators.incr_agg import (
        agg_state,
        merge_deltas,
    )

    # deltas: inserts of new rows plus deletes drawn from EXISTING facts
    # (a consistent feed — the operator's contract)
    inserts = data.draw(facts_st)
    n_del = data.draw(st.integers(0, len(facts)))
    deletes = facts[:n_del]
    deltas = [(k, v, 1) for k, v in inserts] + [
        (k, v, -1) for k, v in deletes
    ]

    facts_df = spark.createDataFrame(
        [(k, float(v)) for k, v in facts] or [(999, 0.0)],
        "k long, v double",
    )
    if not facts:
        facts_df = facts_df.filter("k < 0")
    deltas_df = spark.createDataFrame(
        [(k, float(v), s) for k, v, s in deltas] or [(999, 0.0, 1)],
        "k long, v double, sign int",
    )
    if not deltas:
        deltas_df = deltas_df.filter("k < 0")

    out = merge_deltas(
        agg_state(facts_df, ["k"], ["v"]), deltas_df, ["k"], ["v"]
    )
    got = {
        r.k: (r.n, float(r.sum_v))
        for r in out.selectExpr(
            "k", "n", "cast(sum_v as double) as sum_v"
        ).collect()
    }
    expect = {
        k: (n, float(s)) for k, (n, s) in _agg_model(facts, deltas).items()
    }
    assert got == expect
