"""Small-file compaction — the table-maintenance operator every
long-running ingest needs: streaming micro-batches, dynamic partition
overwrites, and per-executor sinks all fragment tables into files far
below the scan-efficient size, and scan cost at 100 TB is dominated by
file-open/footer overhead once files shrink below ~100 MB.

``compact_parquet`` sizes the rewrite from the TABLE'S OWN bytes (listed
through the Hadoop FileSystem API, so it works on any supported
filesystem, not just local disk), producing ceil(total/target) output
files. With ``order_cols`` the rewrite range-clusters rows
(``repartitionByRange`` + in-partition sort), which makes per-file
min/max zone maps disjoint on the leading order column — the layout that
lets a later filtered scan skip whole files (the same goal as
operators/zorder.py, for the 1-D case).

Why not ``coalesce``: coalesce merges partitions without a shuffle but
inherits the input's row placement — skewed/micro partitions stay
unbalanced and no clustering happens. Compaction is a maintenance job;
it pays one shuffle to buy every future scan's savings.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API (works
    for any configured filesystem scheme, recursively)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    order_cols: list[str] | None = None,
) -> int:
    """Rewrite the parquet table at ``src_path`` into
    ~ceil(source_bytes / target_bytes) files at ``dst_path``; returns
    the ACTUAL number of data files written (range partitioning can
    produce fewer than planned when the clustering key has fewer
    distinct values than planned partitions — empty partitions write no
    file). ``order_cols`` range-clusters the rewrite so per-file min/max
    statistics become disjoint on the leading column.

    Note the sizing reads COMPRESSED source bytes — the right proxy,
    since the rewrite re-compresses with the same codec family.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    df = spark.read.parquet(src_path)
    n_out = max(1, math.ceil(table_bytes(spark, src_path) / target_bytes))
    if order_cols:
        shaped = df.repartitionByRange(n_out, *[F.col(c) for c in order_cols])
        shaped = shaped.sortWithinPartitions(*order_cols)
    else:
        shaped = df.repartition(n_out)
    shaped.write.mode("overwrite").parquet(dst_path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(dst_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n_files = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n_files += 1
    return n_files
