"""Declarative constraint checker (operators/quality.py): each
constraint type on a fixture with planted violations, suite validation,
and the single-scan compilation property."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def fixture(spark):  # noqa: F811
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", 100),
            (2, 10.0, "A", 100),
            (None, 5.0, "B", 200),  # null k
            (4, -1.0, "Z", 999),    # range + accepted-values + fk violations
            (4, 2.0, "A", 100),     # duplicate k
        ],
        "k int, v double, flag string, ref int",
    )
    ref = spark.createDataFrame([(100,), (200,)], "rk int")
    return df, ref


def test_each_constraint_type(spark, fixture):  # noqa: F811
    from yelp_recommender_spark.operators.quality import check_constraints

    df, ref = fixture
    suite = [
        {"type": "not_null", "col": "k"},
        {"type": "range", "col": "v", "lo": 0.0, "hi": 10.0},
        {"type": "accepted_values", "col": "flag", "values": ["A", "B"]},
        {"type": "unique", "cols": ["k"]},
        {"type": "foreign_key", "col": "ref", "ref": ref, "ref_col": "rk"},
    ]
    got = {
        r.check_name: (r.n_violations, r.passed)
        for r in check_constraints(df, suite).collect()
    }
    assert got["not_null:k"] == (1, False)
    assert got["range:v[0.0,10.0]"] == (1, False)  # only -1.0; NULL-free col
    assert got["accepted_values:flag"] == (1, False)  # 'Z'
    # 5 rows, distinct k values {1, 2, None, 4} → 5 - 4 = 1
    assert got["unique:k"] == (1, False)
    assert got["foreign_key:ref->rk"] == (1, False)  # 999


def test_clean_table_passes(spark):  # noqa: F811
    from yelp_recommender_spark.operators.quality import check_constraints

    df = spark.createDataFrame([(1, 5.0)], "k int, v double")
    got = check_constraints(
        df,
        [
            {"type": "not_null", "col": "k"},
            {"type": "range", "col": "v", "lo": 0.0, "hi": 10.0},
            {"type": "unique", "cols": ["k"]},
        ],
    ).collect()
    assert all(r.passed and r.n_violations == 0 for r in got)


def test_suite_validation(spark):  # noqa: F811
    from yelp_recommender_spark.operators.quality import check_constraints

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="empty"):
        check_constraints(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(
            df,
            [
                {"type": "not_null", "col": "k"},
                {"type": "not_null", "col": "k"},
            ],
        )


def test_row_level_checks_share_one_scan(spark, fixture):  # noqa: F811
    """All row-level constraints must compile into a single aggregate
    over a single scan of the input."""
    from yelp_recommender_spark.operators.quality import check_constraints

    df, _ = fixture
    suite = [
        {"type": "not_null", "col": "k"},
        {"type": "range", "col": "v", "lo": 0.0, "hi": 10.0},
        {"type": "accepted_values", "col": "flag", "values": ["A", "B"]},
    ]
    plan = (
        check_constraints(df, suite)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Aggregate") == 1, plan