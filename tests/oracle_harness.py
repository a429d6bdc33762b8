"""Local replica of the driver's Spark-vs-DuckDB comparison so query/oracle
pairs are validated *before* the round gate: row count, column names, and an
order-insensitive value hash over name-sorted columns."""

from __future__ import annotations

import math
from typing import Any


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format to full precision
        if v == 0:
            return "0.0"
        return repr(v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark_df, duck_con, sql: str) -> dict:
    """Return a diff summary dict; `match` True when count+cols+values agree."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d = duck_con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = [tuple(r) for r in d.fetchall()]

    result = {
        "spark_count": len(s_rows),
        "duck_count": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "match": False,
    }
    if sorted(s_cols) != sorted(d_cols) or len(s_rows) != len(d_rows):
        return result
    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    result["match"] = sc == dc
    if not result["match"]:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
        result["first_diffs"] = diffs[:3]
    return result
