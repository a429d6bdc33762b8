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
