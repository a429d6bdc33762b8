"""Grouped-map EWMA (operators/ewma.py): recurrence values, per-key
isolation, ordering, and parameter validation."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def test_ewma_matches_hand_recurrence(spark):  # noqa: F811
    from yelp_recommender_spark.operators.ewma import ewma_by_key

    df = spark.createDataFrame(
        # rows deliberately out of order: the operator must sort by t
        [("a", 3, 3.0), ("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 5.0)],
        "k string, t long, v double",
    )
    out = {
        (r.k, r.t): r.ewma
        for r in ewma_by_key(df, ["k"], "t", "v", alpha=0.3).collect()
    }
    # y1=1; y2=0.7*1+0.3*2=1.3; y3=0.7*1.3+0.3*3=1.81
    assert out[("a", 1)] == pytest.approx(1.0)
    assert out[("a", 2)] == pytest.approx(1.3)
    assert out[("a", 3)] == pytest.approx(1.81)
    assert out[("b", 1)] == pytest.approx(5.0)  # singleton series = seed


def test_ewma_alpha_one_is_identity(spark):  # noqa: F811
    from yelp_recommender_spark.operators.ewma import ewma_by_key

    df = spark.createDataFrame(
        [("a", 1, 4.0), ("a", 2, 9.0)], "k string, t long, v double"
    )
    out = {
        r.t: r.ewma
        for r in ewma_by_key(df, ["k"], "t", "v", alpha=1.0).collect()
    }
    assert out == {1: 4.0, 2: 9.0}


def test_ewma_rejects_bad_alpha(spark):  # noqa: F811
    from yelp_recommender_spark.operators.ewma import ewma_by_key

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, t long, v double")
    with pytest.raises(ValueError):
        ewma_by_key(df, ["k"], "t", "v", alpha=0.0)
    with pytest.raises(ValueError):
        ewma_by_key(df, ["k"], "t", "v", alpha=1.5)
