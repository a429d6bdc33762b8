"""Z-order layout (operators/zorder.py): Morton-code bit algebra vs a
pure-Python reference, SQL-twin parity, bucketizer edges, and the actual
payoff — parquet footer min/max tightening on BOTH dimensions after a
``write_zordered`` write."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def _py_morton(vals: list[int], n_bits: int) -> int:
    z = 0
    n_cols = len(vals)
    for j, v in enumerate(vals):
        for i in range(n_bits):
            z |= ((v >> i) & 1) << (i * n_cols + j)
    return z


def test_zvalue_matches_python_reference(spark):  # noqa: F811
    from yelp_recommender_spark.operators.zorder import zvalue

    rows = [(a, b) for a in [0, 1, 5, 255, 1023] for b in [0, 3, 512, 1023]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zvalue(["a", "b"], 10)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_morton([a, b], 10)


def test_zvalue_sql_twin_identical(spark):  # noqa: F811
    import duckdb

    from yelp_recommender_spark.operators.zorder import zvalue, zvalue_sql

    rows = [(a, b, c) for a in [0, 7, 63] for b in [1, 42] for c in [0, 63]]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = sorted(
        (r.a, r.b, r.c, r.z)
        for r in df.withColumn("z", zvalue(["a", "b", "c"], 6)).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT, c BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = sorted(
        con.execute(
            f"SELECT a, b, c, {zvalue_sql(['a','b','c'], 6)} FROM t"
        ).fetchall()
    )
    assert got == want


def test_zvalue_bit_budget_guard():
    from yelp_recommender_spark.operators.zorder import zvalue

    with pytest.raises(ValueError):
        zvalue(["a", "b"], 32)  # 64 bits > signed long
    with pytest.raises(ValueError):
        zvalue([], 8)


def test_bucketize_minmax_edges(spark):  # noqa: F811
    from yelp_recommender_spark.operators.zorder import bucketize_minmax

    df = spark.createDataFrame(
        [(0.0,), (2.5,), (5.0,), (10.0,), (-3.0,), (99.0,)], "x double"
    )
    got = {
        r.x: r.b
        for r in df.withColumn(
            "b", bucketize_minmax("x", 0.0, 10.0, n_bits=4)
        ).collect()
    }
    assert got[0.0] == 0
    assert got[10.0] == 15  # hi clamps into the top bucket
    assert got[-3.0] == 0 and got[99.0] == 15  # out-of-range clamps
    assert got[2.5] == 4 and got[5.0] == 8  # linear interior


def test_write_zordered_tightens_footers_on_both_dims(spark, tmp_path):  # noqa: F811
    """The point of the operator: after a Z-ordered write, each file's
    min/max span on EACH dimension is a small fraction of the global
    span, so predicate pushdown on either column skips most files. A
    single-key sort gives this for one column only."""
    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.zorder import write_zordered

    n_side = 64  # 64×64 grid, every (x, y) once
    df = (
        spark.range(n_side * n_side)
        .select(
            (F.col("id") % n_side).alias("x"),
            (F.col("id") / n_side).cast("long").alias("y"),
        )
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, ["x", "y"], n_bits=6, n_files=16)

    spans = {"x": [], "y": []}
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) >= 8
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for col in ("x", "y"):
            idx = meta.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans[col].append(max(maxs) - min(mins))
    # global span is 63; a compact Z-curve segment of 1/16 of the grid
    # covers ~1/4 of each side. Require better than half the span on
    # BOTH dims on average — impossible for a one-key layout (the other
    # key would span ~the full domain in every file).
    for col in ("x", "y"):
        avg = sum(spans[col]) / len(spans[col])
        assert avg < (n_side - 1) / 2, (col, spans[col])

    # and the write round-trips completely
    back = spark.read.parquet(out)
    assert back.count() == n_side * n_side
    assert set(back.columns) == {"x", "y"}
