"""Sink contracts: partitioned parquet layout and the bucketing
guarantee — a bucketed-bucketed equi-join on the bucket column must plan
with ZERO Exchange operators (the whole point of paying the bucketed
write: co-located joins at read time)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


def test_partitioned_parquet_layout_and_roundtrip(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.sources.writers import write_parquet

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("bucket_col")
    )
    out = str(tmp_path / "part_out")
    write_parquet(df, out, partition_by=["bucket_col"])
    # hive-style partition directories on disk
    assert sorted(
        d for d in os.listdir(out) if d.startswith("bucket_col=")
    ) == [f"bucket_col={i}" for i in range(4)]
    back = spark.read.parquet(out)
    assert back.count() == 100
    # partition pruning: a filter on the partition column prunes the scan
    plan = back.filter("bucket_col = 2")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket_col" in plan


def test_bucketed_join_plans_without_exchange(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.sources.writers import write_parquet

    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_parquet(a, str(tmp_path / "ta"), bucket_by=(4, "k"), table_name="t_bucket_a")
    write_parquet(b, str(tmp_path / "tb"), bucket_by=(4, "k"), table_name="t_bucket_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
        assert j.count() == 1000
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located by construction: a sort-merge join with NO shuffle
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_orc_round_trip(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.sources.readers import read_orc
    from yelp_recommender_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.0)],
        "id bigint, s string, v double",
    )
    path = str(tmp_path / "orc_rt")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert dict(back.dtypes) == dict(df.dtypes)


def test_csv_round_trip(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.sources.readers import read_csv
    from yelp_recommender_spark.sources.writers import write_csv
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(1, "x", 0.5), (2, "y", 1.25)], "id bigint, s string, v double"
    )
    path = str(tmp_path / "csv_rt")
    write_csv(df, path, coalesce=1)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):  # noqa: F811
    from pyspark.sql import functions as F

    from yelp_recommender_spark.sources.writers import (
        overwrite_partitions_dynamic,
        write_parquet,
    )

    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0), (4, "d3", 40.0)],
        "id long, day string, v double",
    )
    write_parquet(base, path, partition_by=["day"])

    # re-materialize ONLY d2 with corrected values
    fix = spark.createDataFrame([(9, "d2", 99.0)], "id long, day string, v double")
    overwrite_partitions_dynamic(fix, path, ["day"])

    back = spark.read.parquet(path)
    got = {(r.id, r.day, r.v) for r in back.collect()}
    assert got == {
        (1, "d1", 10.0), (2, "d1", 20.0),  # untouched
        (9, "d2", 99.0),                   # replaced, old d2 row gone
        (4, "d3", 40.0),                   # untouched
    }
    # partition pruning works on the layout
    assert back.filter(F.col("day") == "d1").count() == 2
