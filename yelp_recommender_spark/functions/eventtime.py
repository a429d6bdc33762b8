"""Event-time normalization — one epoch-microseconds contract for the
events table, independent of how the running Spark version surfaces
parquet INT64 TIMESTAMP(NANOS).

The representation drifted across Spark releases:

- pre-4.1: the scan rejects NANOS unless
  ``spark.sql.legacy.parquet.nanosAsLong=true``, which yields a LONG of
  raw *nanoseconds*.
- 4.1+: the scan reads NANOS natively as TIMESTAMP_NTZ (µs precision,
  truncated like DuckDB); the legacy conf is ignored. A user-supplied
  LONG schema silently yields *microseconds* — a unit change from the
  legacy conf, which is why this module dispatches on the observed
  column TYPE and never asks for a long in the read schema.

DuckDB (the correctness oracle) reads the same column as a naive
timestamp and ``epoch_us(ts)`` is wall-clock-as-UTC µs. All engine time
arithmetic therefore runs on integer epoch-µs derived by :func:`epoch_us`:

- LONG → raw nanos (legacy conf path): ``ts div 1000`` (exact integral
  division; a double ``/`` would round above 2^51).
- TIMESTAMP_NTZ → timezone-FREE wall-clock arithmetic (unix_date of the
  date part + hour/minute/fractional-second). No cast to TIMESTAMP ever
  happens, so a non-UTC ``spark.sql.session.timeZone`` (the driver may
  use one) cannot shift values, and DST gaps/ambiguities in the session
  zone cannot corrupt them.
- TIMESTAMP (tz-aware, defensive) → cast back to TIMESTAMP_NTZ (which
  reverses the session-zone interpretation the reader applied) and reuse
  the wall-clock arithmetic — identical epoch values under any session
  timezone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pure-NTZ wall-clock → epoch-µs. date_part('SECOND', ts) is DECIMAL(8,6)
# (keeps the fractional µs); every int factor is cast to bigint first —
# hour*3600*1e6 overflows INT under ANSI mode otherwise.
_NTZ_EPOCH_US = (
    "cast(unix_date(cast({c} as date)) as bigint) * 86400000000"
    " + (cast(hour({c}) as bigint) * 3600"
    "    + cast(minute({c}) as bigint) * 60) * 1000000"
    " + cast(date_part('SECOND', {c}) * 1000000 as bigint)"
)


def epoch_us(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds (LongType) of an event-time column, whatever
    representation the reader produced (see module docstring)."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.LongType):
        return F.expr(f"{col} div 1000")
    if isinstance(dtype, T.TimestampNTZType):
        return F.expr(_NTZ_EPOCH_US.format(c=col))
    if isinstance(dtype, T.TimestampType):
        # Defensive branch: a tz-aware TIMESTAMP here means the NTZ
        # parquet column was read under session-local interpretation
        # (e.g. spark.sql.parquet.inferTimestampNTZ.enabled=false).
        # Casting back to TIMESTAMP_NTZ reverses exactly that
        # session-zone shift, recovering the file's wall-clock, and the
        # timezone-free arithmetic then applies. A bare unix_micros()
        # would bake the session offset into epoch values and silently
        # diverge from the oracle under any non-UTC session timezone.
        return F.expr(_NTZ_EPOCH_US.format(c=f"cast({col} as timestamp_ntz)"))
    raise TypeError(
        f"column {col!r} has unsupported event-time type {dtype}; "
        "expected LONG (raw nanos), TIMESTAMP_NTZ, or TIMESTAMP"
    )


def with_ts_us(df: DataFrame, col: str = "ts", out: str = "ts_us") -> DataFrame:
    """``df`` plus an epoch-µs column derived from ``col``."""
    return df.withColumn(out, epoch_us(df, col))
