"""Interval overlap join (operators/rangejoin.interval_overlap_join):
brute-force parity, exactly-once emission across shared buckets, endpoint
touching, empty intervals, and key scoping."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def _pairs(spark, left_rows, right_rows, keys, width):
    from yelp_recommender_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    kcols = "k int, " if keys else ""
    left = spark.createDataFrame(
        left_rows, f"{kcols}lid int, ls long, le long"
    )
    right = spark.createDataFrame(
        right_rows, f"{kcols}rid int, rs long, re long"
    )
    out = interval_overlap_join(
        left, right, keys, "ls", "le", "rs", "re", width
    )
    return sorted((r.lid, r.rid) for r in out.collect())


def _brute(left_rows, right_rows, with_key):
    out = []
    for lrow in left_rows:
        for rrow in right_rows:
            if with_key:
                lk, lid, ls, le = lrow
                rk, rid, rs, re = rrow
                if lk != rk:
                    continue
            else:
                lid, ls, le = lrow
                rid, rs, re = rrow
            if ls <= le and rs <= re and ls <= re and rs <= le:
                out.append((lid, rid))
    return sorted(out)


@pytest.mark.parametrize("width", [1, 3, 16, 1000])
def test_brute_force_parity_and_exactly_once(spark, width):  # noqa: F811
    # long spans sharing many buckets — duplicates would appear if
    # emission weren't gated to the first shared bucket
    left = [(1, 0, 50), (2, 10, 12), (3, 40, 41), (4, 90, 95)]
    right = [(10, 5, 45), (11, 12, 12), (12, 60, 80), (13, 95, 99)]
    got = _pairs(spark, left, right, [], width)
    assert got == _brute(left, right, with_key=False)
    assert len(got) == len(set(got))  # no duplicate emissions


def test_touching_endpoints_count_as_overlap(spark):  # noqa: F811
    got = _pairs(spark, [(1, 0, 10)], [(2, 10, 20)], [], 4)
    assert got == [(1, 2)]


def test_inverted_interval_dropped(spark):  # noqa: F811
    got = _pairs(spark, [(1, 10, 0)], [(2, 0, 100)], [], 4)
    assert got == []


def test_key_scoping(spark):  # noqa: F811
    left = [(1, 1, 0, 10), (2, 2, 0, 10)]
    right = [(1, 9, 5, 6), (2, 8, 50, 60)]
    got = _pairs(spark, left, right, ["k"], 4)
    assert got == _brute(left, right, with_key=True) == [(1, 9)]


def test_overlap_join_auto_width_matches_explicit(spark):  # noqa: F811
    from yelp_recommender_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(1, 0, 10), (1, 20, 30), (2, 5, 50)], "k long, s1 long, e1 long"
    )
    b = spark.createDataFrame(
        [(1, 8, 25), (2, 0, 4), (2, 40, 60)], "k long, s2 long, e2 long"
    )

    def rows(width):
        return sorted(
            tuple(r)
            for r in interval_overlap_join(
                a, b, ["k"], "s1", "e1", "s2", "e2", bucket_width=width
            ).collect()
        )

    assert rows(None) == rows(7) and len(rows(None)) == 3
