"""Loader for the driver's synthetic star-schema tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from yelp_recommender_spark.schemas import TESTDATA_TABLES


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the requested parquet tables from ``sf_dir``.

    Parquet is self-describing, so no schema is imposed — Catalyst still
    prunes columns and pushes predicates into the scan.
    """
    # events.parquet carries INT64 TIMESTAMP(NANOS). Spark <4.1 rejects it
    # unless this legacy conf surfaces it as raw-nanos LONG; Spark 4.1+
    # ignores the conf and reads TIMESTAMP_NTZ natively (µs, truncated
    # like DuckDB). Consumers never assume either: they derive epoch-µs
    # via functions.eventtime.epoch_us, which dispatches on the type.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed entirely in some future version — fine
    out: dict[str, DataFrame] = {}
    for name in names or TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
        elif names is not None:
            raise FileNotFoundError(
                f"table '{name}' not found: {path} (check sf_dir={sf_dir!r})"
            )
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register every table as a temp view (for the SQL API)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
