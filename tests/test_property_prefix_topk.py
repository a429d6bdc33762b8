"""Property-based exactness checks (hypothesis) for the distributed
prefix sum and the top-K family. with_prefix_sum's documented claim —
the output is invariant to bucket assignment, so ANY n_buckets gives
the same running totals as a sequential cumsum — is verified directly
across bucket counts, including negative values (sketch boundaries from
skewed/negative keys must steer only load balance). Top-K: with a
unique tie-break both operators must equal Python sorted slices."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

rows_st = st.dictionaries(
    st.integers(-20, 20),  # globally-unique order key (dict keys)
    st.integers(-5, 5),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st, n_buckets=st.sampled_from([None, 1, 2, 3, 7]))
def test_prefix_sum_matches_sequential_cumsum(spark, rows, n_buckets):  # noqa: F811
    from yelp_recommender_spark.cache import clear_caches
    from yelp_recommender_spark.operators.prefix import with_prefix_sum

    df = spark.createDataFrame(
        [(k, v) for k, v in rows.items()], "k long, v long"
    )
    got = {
        r.k: r.cum
        for r in with_prefix_sum(
            df, "k", "v", out_col="cum", n_buckets=n_buckets
        ).collect()
    }
    clear_caches()  # release the registry-persisted bucketed intermediate
    run = 0
    want = {}
    for k in sorted(rows):
        run += rows[k]
        want[k] = run
    assert got == want


keyed_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),  # key
        st.integers(0, 3),  # order value (ties likely)
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(items=keyed_st, n=st.sampled_from([1, 2, 3]))
def test_top_n_per_key_matches_sorted_slices(spark, items, n):  # noqa: F811
    from yelp_recommender_spark.operators.topk import (
        top_k_global,
        top_n_per_key,
    )

    rows = [(k, v, i) for i, (k, v) in enumerate(items)]
    df = spark.createDataFrame(rows, "k string, v long, uid long")

    got = sorted(
        (r.k, r.v, r.uid)
        for r in top_n_per_key(df, ["k"], "v", n, tiebreak="uid").collect()
    )
    want = sorted(
        t
        for key in {k for k, _, _ in rows}
        for t in sorted(
            (r for r in rows if r[0] == key), key=lambda r: (-r[1], r[2])
        )[:n]
    )
    assert got == want

    got_g = [
        (r.k, r.v, r.uid)
        for r in top_k_global(df, "v", n, tiebreak="uid").collect()
    ]
    want_g = sorted(rows, key=lambda r: (-r[1], r[2]))[:n]
    assert got_g == want_g
