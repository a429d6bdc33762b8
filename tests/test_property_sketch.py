"""Property-based checks (hypothesis) for the mergeable sketch family:
the Misra-Gries guarantees and the histogram quantile bound are each
verified against a plain Python reference model over randomized feeds
and randomized SPLITS — the hand fixtures cannot cover the
combinatorics of which items survive a compress, where the (k+1)-th
count ties, or how a merge tree distributes the error budget."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

# (key, item) feeds over a tiny alphabet: ties and total-wipeout
# compresses (every count equal) happen often by construction
feed_st = st.lists(
    st.tuples(st.sampled_from([0, 1]), st.sampled_from("abcdefg")),
    min_size=1,
    max_size=40,
)
split_st = st.integers(0, 40)
K = 3


def _mg_model_check(state_rows, exact_by_key, k):
    """The three Misra-Gries guarantees against exact counts."""
    by_key: dict = {}
    for r in state_rows:
        by_key.setdefault(r.k, []).append(r)
    # every key with data must keep its bookkeeping (sentinel row)
    assert set(by_key) == set(exact_by_key)
    for key, rs in by_key.items():
        delta = rs[0].mg_delta
        total = rs[0].mg_n
        assert all(r.mg_delta == delta and r.mg_n == total for r in rs)
        assert total == sum(exact_by_key[key].values())
        assert delta <= total / (k + 1)
        present = {r.item for r in rs if r.item is not None}
        assert len(present) <= k
        for r in rs:
            if r.item is not None:
                assert r.n_lo >= 1
                assert r.n_lo <= exact_by_key[key][r.item] <= r.n_lo + delta
        for item, c in exact_by_key[key].items():
            if item not in present:
                assert c <= delta
            if c > total / (k + 1):
                assert item in present


def _exact_by_key(rows):
    out: dict = {}
    for k, it in rows:
        out.setdefault(k, Counter())[it] += 1
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feed=feed_st, cut=split_st)
def test_mg_guarantees_hold_under_any_split(spark, feed, cut):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import mg_merge, mg_state

    cut = min(cut, len(feed))
    exact = _exact_by_key(feed)
    df = spark.createDataFrame(feed, "k int, item string")
    _mg_model_check(
        mg_state(df, ["k"], "item", k=K).collect(), exact, K
    )
    if cut in (0, len(feed)):
        return
    a = spark.createDataFrame(feed[:cut], "k int, item string")
    b = spark.createDataFrame(feed[cut:], "k int, item string")
    merged = mg_merge(
        mg_state(a, ["k"], "item", k=K),
        mg_state(b, ["k"], "item", k=K),
        ["k"],
    )
    _mg_model_check(merged.collect(), exact, K)


values_st = st.lists(
    st.one_of(
        st.integers(-1000, 1000),
        st.sampled_from([0, 0, 1, -1, 7, 1000000]),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=values_st, cut=st.integers(0, 30), q=st.floats(0.01, 0.99))
def test_hist_quantile_bound_and_merge_exactness(spark, vals, cut, q):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        hist_merge,
        hist_quantiles,
        hist_state,
    )

    bpo = 8
    rows = [(0, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "k int, v double")
    state = hist_state(df, ["k"], "v", bins_per_octave=bpo)
    name = f"q_{q}".replace(".", "_")
    got = hist_quantiles(state, [q]).collect()[0][name]
    # reference: smallest value whose exact cumulative count reaches
    # q*total (the operator's documented rank rule)
    ordered = sorted(float(v) for v in vals)
    total = len(ordered)
    idx = math.ceil(q * total) - 1
    idx = min(max(idx, 0), total - 1)
    true_v = ordered[idx]
    bound = 2 ** (1.0 / (2 * bpo)) * (1 + 1e-9)
    if true_v == 0:
        assert got == 0.0
    elif true_v > 0:
        assert true_v / bound <= got <= true_v * bound
    else:
        assert true_v * bound <= got <= true_v / bound

    # merge exactness (linear sketch): any split folds to the same table
    cut = min(cut, len(rows))
    if cut in (0, len(rows)):
        return
    a = spark.createDataFrame(rows[:cut], "k int, v double")
    b = spark.createDataFrame(rows[cut:], "k int, v double")
    merged = hist_merge(
        hist_state(a, ["k"], "v", bins_per_octave=bpo),
        hist_state(b, ["k"], "v", bins_per_octave=bpo),
    )
    assert sorted((r.bin, r.n) for r in merged.collect()) == sorted(
        (r.bin, r.n) for r in state.collect()
    )


items_st = st.lists(st.sampled_from("abcdefghij"), min_size=1, max_size=25)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(items=items_st, cut=st.integers(0, 25))
def test_kmv_merge_equals_whole_for_any_split(spark, items, cut):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import kmv_merge, kmv_state

    k = 4
    rows = [(0, it) for it in items]
    df = spark.createDataFrame(rows, "k int, item string")
    whole = {
        tuple((e.h, e.item) for e in r.kmv)
        for r in kmv_state(df, ["k"], "item", k=k).collect()
    }
    cut = min(cut, len(rows))
    if cut in (0, len(rows)):
        return
    a = spark.createDataFrame(rows[:cut], "k int, item string")
    b = spark.createDataFrame(rows[cut:], "k int, item string")
    merged = {
        tuple((e.h, e.item) for e in r.kmv)
        for r in kmv_merge(
            kmv_state(a, ["k"], "item", k=k),
            kmv_state(b, ["k"], "item", k=k),
            ["k"],
        ).collect()
    }
    assert merged == whole  # bottom-k of a union: EXACT under any split
