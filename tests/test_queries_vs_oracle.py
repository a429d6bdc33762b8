"""Every registered query with an oracle must match DuckDB at sf0.001 (fast)
— the same check the driver runs at sf0.01. Queries without oracles must at
least execute and return a stable schema."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR, register_duck_views
from tests.oracle_harness import compare_query

import yelp_recommender_spark.queries as Q


@pytest.fixture(scope="module")
def duck_small():
    con = duckdb.connect()
    register_duck_views(con, SF_DIR)
    return con


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_runs(spark, name):
    df = Q.QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name} returned no columns"
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(Q.ORACLES))
def test_query_matches_oracle(spark, duck_small, name):
    df = Q.QUERIES[name](spark, SF_DIR)
    res = compare_query(df, duck_small, Q.ORACLES[name])
    assert res["match"], f"{name}: {res}"
