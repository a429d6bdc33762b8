"""Bloom-filter semi-join (operators/bloom.py): no false negatives ever,
measured false-positive rate near the analytic formula, exactness of the
composed semi-join, map-side probe plan (no Exchange on the fact side),
and the sizing helpers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def keyed(spark):  # noqa: F811
    # keys 0..999 inserted; probes 0..9999 → 9000 true negatives
    small = spark.range(1000).select(F.col("id").alias("k"))
    big = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    return small, big


def test_no_false_negatives(keyed):
    from yelp_recommender_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    small, big = keyed
    bloom = bloom_build(small, "k", m_bits=1 << 14, n_hashes=5)
    kept = {r.k for r in bloom_probe(big, "k", bloom, 1 << 14, 5).collect()}
    assert set(range(1000)) <= kept  # every inserted key survives


def test_false_positive_rate_near_formula(keyed):
    from yelp_recommender_spark.operators.bloom import (
        bloom_build,
        bloom_fpp,
        bloom_probe,
    )

    small, big = keyed
    m, k = 1 << 14, 5
    bloom = bloom_build(small, "k", m_bits=m, n_hashes=k)
    kept = bloom_probe(big, "k", bloom, m, k).count()
    fp = kept - 1000
    expected = bloom_fpp(1000, m, k)  # ~0.0094 at 16 Kib / 1000 keys
    # 9000 negative trials; allow generous 3× head-room either way
    assert fp / 9000 < 3 * expected + 0.01
    # and the filter actually filters (not a pass-through)
    assert kept < 3000


def test_bloom_semi_join_exact(keyed):
    from yelp_recommender_spark.operators.bloom import bloom_semi_join

    small, big = keyed
    odd = small.filter(F.col("k") % 2 == 1)
    got = sorted(
        (r.k, r.payload)
        for r in bloom_semi_join(big, odd, "k", m_bits=1 << 13).collect()
    )
    want = sorted((k, 2 * k) for k in range(1, 1000, 2))
    assert got == want


def test_probe_plan_is_map_side_only(keyed, tmp_path):
    """The probed (fact) side must reach the bit-test filter without any
    Exchange: the whole point is pruning BEFORE the shuffle. The bloom
    is materialized first (its own tiny build shuffle is paid once at
    build time, exactly how a reused bloom is deployed)."""
    from yelp_recommender_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    small, big = keyed
    path = str(tmp_path / "bloom")
    bloom_build(small, "k", m_bits=1 << 14, n_hashes=3).write.parquet(path)
    bloom = small.sparkSession.read.parquet(path)
    plan = bloom_probe(
        big, "k", bloom, 1 << 14, 3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only exchanges allowed are broadcast exchanges of the word table
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"unexpected shuffle in probe plan: {line}")


def test_sizing_helpers():
    from yelp_recommender_spark.operators.bloom import (
        bloom_fpp,
        bloom_m_for_fpp,
    )

    m = bloom_m_for_fpp(1_000_000, 0.01)
    assert m % 64 == 0
    # textbook: ~9.59 bits/key at 1% fpp
    assert 9_000_000 < m < 10_500_000
    assert bloom_fpp(1_000_000, m, 7) < 0.011
    assert bloom_fpp(0, 64, 5) == 0.0
    with pytest.raises(ValueError):
        from yelp_recommender_spark.operators.bloom import bloom_build as bb

        bb(None, "k", m_bits=100)  # not a multiple of 64


def test_empty_small_side(keyed, spark):  # noqa: F811
    from yelp_recommender_spark.operators.bloom import bloom_semi_join

    _, big = keyed
    empty = spark.createDataFrame([], "k long")
    assert bloom_semi_join(big, empty, "k", m_bits=64).count() == 0


def test_probe_rejects_mismatched_parameters(keyed):
    from yelp_recommender_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    small, big = keyed
    bloom = bloom_build(small, "k", m_bits=1 << 14, n_hashes=3)
    with pytest.raises(ValueError, match="false negatives"):
        bloom_probe(big, "k", bloom, m_bits=1 << 20, n_hashes=5)


def test_semi_join_unifies_key_dtypes(keyed, spark):  # noqa: F811
    """An INT key side against a BIGINT fact side must still be exact:
    xxhash64 hashes the two types differently, so without the cast every
    inserted key would probe the wrong bit positions (false negatives)."""
    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.bloom import bloom_semi_join

    _, big = keyed
    small_int = spark.range(100).select(F.col("id").cast("int").alias("k"))
    got = sorted(
        r.k for r in bloom_semi_join(big, small_int, "k", m_bits=1 << 12).collect()
    )
    assert got == list(range(100))
