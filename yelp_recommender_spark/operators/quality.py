"""Declarative data-quality constraint checking (the Deequ/expectations
shape): a constraint suite is DATA, the checker compiles it into the
minimum number of Spark jobs, and the output is a relational report a
pipeline can gate on (``passed = n_violations == 0``) and append to a
quality-history table.

Compilation strategy — the part that matters at 100 TB:

- Every ROW-LEVEL constraint (not_null, range, accepted_values) becomes
  one conditional-count expression; ALL of them run in a SINGLE
  aggregate pass over the table (one scan, map-side partials, a 1-row
  result), regardless of how many constraints the suite holds.
- SET-LEVEL constraints need their own shuffle by nature: uniqueness is
  one distinct-count aggregate per declared key set; referential
  integrity is one anti-join per foreign key (broadcast when the
  referenced key side is a dimension).

The report unions these tiny results — constraint evaluation cost is
O(scans + declared key-set shuffles), never per-constraint table scans.

Measured and REJECTED (r10): fusing the set-level passes into the
row-level scan — uniqueness via a mixed distinct/plain aggregate
(Expand) and dimension FKs via broadcast-join match markers — made the
q115 suite consistently SLOWER (1.0-1.5 s → 1.3-1.8 s interleaved at
sf0.1): each separate pass is a narrow column-pruned scan, while the
fused pass reads the union of all constrained columns and Expand
doubles the aggregate's input rows. Scan COUNT is the wrong metric
when the scans prune to disjoint narrow columns; keep the three-pass
shape.

Constraint spec (plain dicts, serializable → suites live in config):

    {"type": "not_null",        "col": "l_orderkey"}
    {"type": "range",           "col": "l_quantity", "lo": 1, "hi": 40}
    {"type": "accepted_values", "col": "l_returnflag",
     "values": ["A", "N", "R"]}
    {"type": "unique",          "cols": ["l_orderkey", "l_linenumber"]}
    {"type": "foreign_key",     "col": "l_orderkey",
     "ref": <DataFrame>,        "ref_col": "o_orderkey"}
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROW_LEVEL = ("not_null", "range", "accepted_values")


def constraint_name(c: dict[str, Any]) -> str:
    """Stable report key for a constraint spec."""
    t = c["type"]
    if t == "not_null":
        return f"not_null:{c['col']}"
    if t == "range":
        return f"range:{c['col']}[{c['lo']},{c['hi']}]"
    if t == "accepted_values":
        return f"accepted_values:{c['col']}"
    if t == "unique":
        return "unique:" + ",".join(c["cols"])
    if t == "foreign_key":
        return f"foreign_key:{c['col']}->{c['ref_col']}"
    raise ValueError(f"unknown constraint type: {t!r}")


def _violation_expr(c: dict[str, Any]) -> Column:
    t = c["type"]
    col = F.col(c["col"])
    if t == "not_null":
        bad = col.isNull()
    elif t == "range":
        # NULLs are not range violations — declare not_null separately
        bad = col.isNotNull() & ((col < c["lo"]) | (col > c["hi"]))
    elif t == "accepted_values":
        bad = col.isNotNull() & ~col.isin(list(c["values"]))
    else:  # pragma: no cover - guarded by caller
        raise ValueError(t)
    return F.count(F.when(bad, 1))


def check_constraints(
    df: DataFrame, constraints: list[dict[str, Any]]
) -> DataFrame:
    """Evaluate the suite; returns (check_name, n_violations, passed),
    one row per constraint. See module docstring for the job plan."""
    if not constraints:
        raise ValueError("empty constraint suite")
    names = [constraint_name(c) for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraints in suite: {names}")

    reports: list[DataFrame] = []
    row_level = [c for c in constraints if c["type"] in _ROW_LEVEL]
    if row_level:
        one = df.agg(
            *[
                _violation_expr(c).alias(f"_v{i}")
                for i, c in enumerate(row_level)
            ]
        )
        # melt the 1-row aggregate to report rows (row-local generator)
        kvs = F.array(
            *[
                F.struct(
                    F.lit(constraint_name(c)).alias("check_name"),
                    F.col(f"_v{i}").alias("n_violations"),
                )
                for i, c in enumerate(row_level)
            ]
        )
        reports.append(
            one.select(F.explode(kvs).alias("kv")).select("kv.*")
        )

    for c in constraints:
        if c["type"] == "unique":
            cols = [F.col(x) for x in c["cols"]]
            reports.append(
                df.agg(
                    (
                        F.count(F.lit(1))
                        - F.countDistinct(F.struct(*cols))
                    ).alias("n_violations")
                ).select(
                    F.lit(constraint_name(c)).alias("check_name"),
                    "n_violations",
                )
            )
        elif c["type"] == "foreign_key":
            from yelp_recommender_spark.operators.ann import (
                estimated_size_bytes,
            )

            ref = c["ref"].select(
                F.col(c["ref_col"]).alias(c["col"])
            ).distinct()
            # hint broadcast only when plan stats prove the referenced
            # key side is dimension-sized — a forced hint on a 100-TB
            # referenced table would override the broadcast threshold
            # and OOM; unhinted, Catalyst still auto-broadcasts small
            # sides and shuffles large ones (enrich_stream's guard)
            size = estimated_size_bytes(ref)
            if size is not None and 0 < size <= (64 << 20):
                ref = F.broadcast(ref)
            orphans = df.select(c["col"]).join(ref, c["col"], "left_anti")
            reports.append(
                orphans.agg(
                    F.count(F.lit(1)).alias("n_violations")
                ).select(
                    F.lit(constraint_name(c)).alias("check_name"),
                    "n_violations",
                )
            )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
