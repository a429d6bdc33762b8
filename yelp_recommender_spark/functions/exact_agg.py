"""Order-independent (exact) floating aggregates.

Distributed double sums are order-dependent: partial aggregation means the
same query can hash differently across engines (or across runs with a
different partition count). For results that must be *reproducible* —
e.g. compared against an external oracle, or diffed between pipeline
versions at 100 TB — we sum in fixed-point: cast each term to a DECIMAL
with enough integer digits and a fixed scale, sum exactly (decimal
addition is associative and commutative), and cast the final total back to
DOUBLE. The result is bit-identical regardless of partitioning, AQE
decisions, or engine.

Cost: decimal sum is marginally slower than double sum but still
whole-stage-codegen'd JVM arithmetic — no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits max in Spark/DuckDB; scale 6 leaves 10^32 of headroom.
_SCALE = 6
_PRECISION = 38


def dsum(col: Column | str, scale: int = _SCALE) -> Column:
    """Exact sum of a double column, returned as double.

    ``sum(cast(x as decimal(27, scale)))`` — each term is rounded to
    ``scale`` fractional digits (deterministic: the double input is
    identical everywhere), summed exactly, then cast back.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double")


def davg(col: Column | str, scale: int = _SCALE) -> Column:
    """Order-independent mean: exact decimal sum / count, one IEEE divide."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_expr(expr: str, scale: int = _SCALE) -> str:
    """SQL-string form of :func:`dsum` for oracle parity
    (identical semantics in DuckDB)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"
