"""Registry mapping query names to (Spark implementation, SQL oracle).

Contract (driver's ``__spark_entry__`` interface):
- implementation: ``(SparkSession, sf_dir) -> DataFrame``
- oracle: ANSI SQL over the same parquet tables, runnable by DuckDB;
  column names MUST match the DataFrame's (the comparator sorts columns
  by name and hashes values).

Float determinism policy (so Spark and DuckDB hash identically):
- sums of doubles → exact DECIMAL sums cast back to DOUBLE
  (:mod:`yelp_recommender_spark.functions.exact_agg`);
- ratio-of-sums / means → two exact sums + one IEEE divide;
- genuinely order-dependent statistics (corr, cosine) → ``round(x, 6)``
  on both sides (error ~1e-12 ≪ rounding granularity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it rows-only (non-SQL ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
