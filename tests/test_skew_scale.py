"""Measured skew handling at scale (VERDICT r5 #8 stretch): the sf1
amplifier is FK-consistent and roughly uniform, so round-5's two-decade
sweep never exercised a power-law key. This opt-in harness plants a
whale (one user owning ~10% of all events, ``skewgen.plant_skew``) into
the amplified sf1 events table and measures, uniform vs skewed:

- the window/sessionization queries (q18, q102 — partitionBy the hot
  key: the shape AQE cannot split);
- plain vs salted two-stage aggregation (expectation, recorded
  honestly: Spark's map-side partial aggregation already neutralizes
  pure agg skew, so salting should be ~neutral here — its win is joins);
- plain sort-merge vs salted join against a non-broadcastable dim on
  the hot key (broadcast disabled to force the skew-relevant plan; AQE
  skew-split disabled so the salting is measured, not AQE).

Gates are deliberately LOOSE (existence + correctness + a generous
linear-ish wall bound) — the numbers themselves land in BASELINE.md,
the same protocol as the second-decade scale sweep."""

from __future__ import annotations

import os
import time

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF1"),
    reason="skew-at-scale sweep is opt-in (amplifies ~170 MB, runs "
    "minutes); set SPARK_GRAFT_SWEEP_SF1=1",
)

SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(__file__), "..", "scale_data", "sf1"),
)
SKEW_DIR = os.path.join(os.path.dirname(SF1_DIR), "sf1_skew")
MAX_SKEW_GROWTH = 25.0
FLOOR_S = 0.5


def _dirs():
    from yelp_recommender_spark.amplify import amplify
    from yelp_recommender_spark.skewgen import plant_skew

    amplify("/root/testdata/sf0.1", SF1_DIR, 10)  # idempotent
    plant_skew(SF1_DIR, SKEW_DIR)  # idempotent
    return SF1_DIR, SKEW_DIR


def _timed(fn):
    start = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - start


def test_window_queries_survive_planted_whale(spark):  # noqa: F811
    """q18/q102 partition their windows by user_id; the whale makes one
    partition own 10% of the table. Sessions stay correct and the wall
    delta stays within a loose linear-ish bound (recorded in
    BASELINE.md)."""
    from yelp_recommender_spark.cache import clear_caches
    from yelp_recommender_spark.queries import QUERIES

    uniform, skewed = _dirs()
    QUERIES["q01_pricing_summary"](spark, uniform).count()  # warm
    report = {}
    for name in ("q18_user_sessions", "q102_event_sequences"):
        clear_caches()
        _, t_u = _timed(lambda: QUERIES[name](spark, uniform).count())
        clear_caches()
        n_s, t_s = _timed(lambda: QUERIES[name](spark, skewed).count())
        assert n_s > 0
        ratio = t_s / max(t_u, FLOOR_S)
        report[name] = (round(t_u, 2), round(t_s, 2), round(ratio, 2))
        assert ratio < MAX_SKEW_GROWTH, f"{name}: {report[name]}"
    print("skew window report (uniform_s, skewed_s, ratio):", report)


def test_salted_aggregate_identical_and_timed_on_whale(spark):  # noqa: F811
    from yelp_recommender_spark.cache import clear_caches
    from yelp_recommender_spark.operators.skew import salted_aggregate
    from yelp_recommender_spark.sources.tables import load_tables

    _, skewed = _dirs()
    clear_caches()
    ev = load_tables(spark, skewed, ["events"])["events"].select(
        "user_id", "value"
    )
    aggs = {
        "n": ("*", "count"),
        "total": ("value", "dsum"),
        "avg_value": ("value", "avg"),
    }
    # the plain twin, explicitly under the same exact-decimal policy
    from pyspark.sql import functions as F

    plain_df = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("total"),
        (
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
            / F.count("value")
        ).alias("avg_value"),
    )
    plain, t_plain = _timed(
        lambda: sorted(tuple(r) for r in plain_df.collect())
    )
    salted, t_salted = _timed(
        lambda: sorted(
            tuple(r)
            for r in salted_aggregate(
                ev, ["user_id"], aggs, n_salts=16
            ).collect()
        )
    )
    assert salted == plain  # bit-identical under the exact-decimal policy
    print(
        "skew agg report: plain",
        round(t_plain, 2),
        "salted",
        round(t_salted, 2),
    )


def test_salted_join_identical_and_timed_on_whale(spark):  # noqa: F811
    from yelp_recommender_spark.cache import clear_caches
    from yelp_recommender_spark.operators.skew import salted_join
    from yelp_recommender_spark.sources.tables import load_tables

    from pyspark.sql import functions as F

    _, skewed = _dirs()
    clear_caches()
    ev = load_tables(spark, skewed, ["events"])["events"].select(
        "user_id", "value"
    )
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7)))
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe_bc = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    prev_aqe_skew = spark.conf.get(
        "spark.sql.adaptive.skewJoin.enabled", None
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        agg = lambda df: df.groupBy("segment").agg(  # noqa: E731
            F.count(F.lit(1)).alias("n")
        )
        plain, t_plain = _timed(
            lambda: sorted(
                tuple(r) for r in agg(ev.join(dim, "user_id")).collect()
            )
        )
        salted, t_salted = _timed(
            lambda: sorted(
                tuple(r)
                for r in agg(
                    salted_join(ev, dim, "user_id", n_salts=16)
                ).collect()
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        if prev_aqe_bc is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe_bc
            )
        if prev_aqe_skew is not None:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", prev_aqe_skew
            )
    assert salted == plain
    print(
        "skew join report: plain",
        round(t_plain, 2),
        "salted",
        round(t_salted, 2),
    )
