"""epoch_us contract: identical epoch values from every event-time
representation, under ANY session timezone (ADVICE r3: the tz-aware
TIMESTAMP branch used unix_micros(), which bakes the session offset into
epoch values when the reader interpreted wall-clock as session-local)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)

# wall-clock instant used throughout; its epoch-µs *as UTC* is the
# contract value whatever the session timezone says
WALL = "2024-01-02 03:04:05.123456"
WALL_US = int(
    dt.datetime(2024, 1, 2, 3, 4, 5, 123456, tzinfo=dt.timezone.utc)
    .timestamp() * 1_000_000
)


def _epoch(df):
    from yelp_recommender_spark.functions.eventtime import epoch_us

    return df.select(epoch_us(df, "ts").alias("us")).head().us


def test_ntz_branch_ignores_session_timezone(spark):  # noqa: F811
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.sql(
                f"SELECT cast('{WALL}' as timestamp_ntz) AS ts"
            )
            assert _epoch(df) == WALL_US, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_tz_aware_branch_reverses_session_interpretation(spark):  # noqa: F811
    """A tz-aware TIMESTAMP holding session-local wall-clock (what a
    reader with NTZ inference off produces) must yield the same epoch-µs
    as the NTZ path — not values shifted by the session offset."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.sql(f"SELECT cast('{WALL}' as timestamp) AS ts")
            assert df.schema["ts"].dataType.typeName() == "timestamp"
            assert _epoch(df) == WALL_US, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_long_branch_is_integral_nanos_division(spark):  # noqa: F811
    df = spark.range(1).select(
        F.lit(WALL_US * 1000 + 999).cast("bigint").alias("ts")
    )
    assert _epoch(df) == WALL_US  # div 1000, exact, truncating
