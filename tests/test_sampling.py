"""Deterministic hash-gated sampling: reproducible under repartitioning
(the property df.sample lacks), correct fractions, stratified rates."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def test_sample_stable_under_repartitioning(spark):  # noqa: F811
    from yelp_recommender_spark.functions.sampling import deterministic_sample

    df = spark.range(2000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, "k", 64).collect()}
    b = {
        r.k
        for r in deterministic_sample(df.repartition(17), "k", 64).collect()
    }
    assert a == b  # same rows whatever the partitioning
    # and roughly the promised quarter of the data
    assert 0.2 < len(a) / 2000 < 0.3


def test_sample_edge_fractions(spark):  # noqa: F811
    from yelp_recommender_spark.functions.sampling import (
        deterministic_sample,
        hash_sample_gate,
    )

    df = spark.range(100).withColumnRenamed("id", "k")
    assert deterministic_sample(df, "k", 256).count() == 100
    assert deterministic_sample(df, "k", 0).count() == 0
    with pytest.raises(ValueError):
        hash_sample_gate("k", 300)


def test_stratified_rates(spark):  # noqa: F811
    from yelp_recommender_spark.functions.sampling import stratified_sample

    rows = [(i, "hot" if i % 2 == 0 else "cold") for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, src string")
    kept = stratified_sample(
        df, "k", "src", {"hot": 32}, default_keep_n=128
    )
    frac = {
        r.src: r.n / 2000
        for r in kept.groupBy("src").count().withColumnRenamed("count", "n")
        .collect()
    }
    assert 0.08 < frac["hot"] < 0.17  # ≈ 32/256
    assert 0.45 < frac["cold"] < 0.55  # ≈ 128/256
    # sampling a key keeps the SAME key in every stratum config that
    # shares its rate — joinability across pipeline stages
    again = {
        r.k
        for r in stratified_sample(
            df, "k", "src", {"hot": 32, "cold": 128}
        ).collect()
    }
    assert {r.k for r in kept.collect()} == again


def test_weighted_sample_prefers_heavy_rows(spark):  # noqa: F811
    from pyspark.sql import functions as F

    from yelp_recommender_spark.functions.sampling import weighted_sample_n

    # 100 heavy rows (w=100) among 900 light (w=1): heavy rows carry
    # ~92% of the total weight, so a 50-row draw is heavy-dominated
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 100, F.lit(100.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    got = weighted_sample_n(df, "k", "w", 50).collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r.k < 100)
    assert heavy > 30  # unweighted expectation would be 5

    # uniform weights reduce to an unweighted deterministic draw
    uni = weighted_sample_n(
        df.withColumn("w", F.lit(1.0)), "k", "w", 50
    ).collect()
    heavy_uni = sum(1 for r in uni if r.k < 100)
    assert heavy_uni < 20


def test_weighted_sample_deterministic_and_guards(spark):  # noqa: F811
    from pyspark.sql import functions as F

    from yelp_recommender_spark.functions.sampling import weighted_sample_n

    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    a = sorted(r.k for r in weighted_sample_n(df, "k", "w", 40).collect())
    b = sorted(
        r.k
        for r in weighted_sample_n(df.repartition(13), "k", "w", 40).collect()
    )
    assert a == b  # partitioning-independent

    # non-positive weights are excluded entirely
    z = df.withColumn(
        "w", F.when(F.col("k") < 490, F.lit(0.0)).otherwise(F.col("w"))
    )
    got = {r.k for r in weighted_sample_n(z, "k", "w", 40).collect()}
    assert got <= set(range(490, 500))


def test_md5_uniform_range_and_determinism(spark):  # noqa: F811
    from pyspark.sql import functions as F

    from yelp_recommender_spark.functions.sampling import md5_uniform

    df = spark.range(2000).select(F.col("id").alias("k"))
    us = [r.u for r in df.select(md5_uniform("k").alias("u")).collect()]
    assert all(0.0 < u <= 1.0 for u in us)
    # roughly uniform: mean near 0.5
    assert 0.45 < sum(us) / len(us) < 0.55
