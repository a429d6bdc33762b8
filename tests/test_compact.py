"""Small-file compaction (operators/compact.py): file-count reduction,
content equality, and zone-map-disjoint range clustering."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from tests.conftest import spark  # noqa: F811,F401 (fixture)


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.operators.compact import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # 64 tiny files
    df = spark.range(0, 10_000).selectExpr("id", "id * 3 as v")
    df.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    total = sum(os.path.getsize(f) for f in _parquet_files(src))
    # target half the table → 2 output files
    n_out = compact_parquet(spark, src, dst, target_bytes=(total + 1) // 2)
    assert n_out == 2
    assert len(_parquet_files(dst)) == 2

    got = sorted(
        (r.id, r.v) for r in spark.read.parquet(dst).collect()
    )
    assert got == [(i, 3 * i) for i in range(10_000)]


def test_compact_range_clustering_disjoint_zone_maps(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.operators.compact import compact_parquet

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(0, 20_000).selectExpr(
        "pmod(id * 7919, 20000) as k", "id as v"
    ).repartition(32).write.parquet(src)

    total = sum(os.path.getsize(f) for f in _parquet_files(src))
    n_out = compact_parquet(
        spark, src, dst, target_bytes=total // 4 + 1, order_cols=["k"]
    )
    assert n_out >= 2

    # per-file min/max on k must be pairwise disjoint → a filtered scan
    # can skip whole files on the k zone map
    ranges = []
    for f in _parquet_files(dst):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "k"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: {ranges}"


def test_compact_rejects_bad_target(spark, tmp_path):  # noqa: F811
    import pytest

    from yelp_recommender_spark.operators.compact import compact_parquet

    with pytest.raises(ValueError):
        compact_parquet(spark, str(tmp_path), str(tmp_path), target_bytes=0)
