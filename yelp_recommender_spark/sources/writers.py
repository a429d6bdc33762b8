"""Sinks (SURVEY.md §2.1 S5-S8).

The reference writes predictions with a driver-side loop
(``/root/reference/models/content_based_model.py:534-539``) and model
artifacts through executor-side ``open(file, 'a')`` appends that race
under parallelism (``/root/reference/models/content_based_model.py:404-418``).
Both are replaced by distributed writers: ``df.write.json`` for the
JSON-lines contracts, Parquet for all model state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json_lines(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    """JSON-lines sink (S5). ``coalesce=1`` reproduces the reference's
    single-file output contract for small results; leave None at scale."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, str] | None = None,
    table_name: str | None = None,
) -> None:
    """Parquet sink (S7/S8 successor). ``bucket_by=(n, col)`` writes a
    bucketed EXTERNAL table at ``path`` (registered as ``table_name`` —
    bucket metadata lives in the catalog) so later joins/aggs on ``col``
    skip the shuffle entirely — the scale path for model weight tables
    reused across queries. Verified by tests/test_writers.py: a
    bucketed-bucketed equi-join plans with zero Exchange operators."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, col = bucket_by
        writer.option("path", path).bucketBy(n, col).sortBy(col).saveAsTable(
            table_name or "bucketed_out"
        )
        return
    writer.parquet(path)


def write_predictions(df: DataFrame, path: str) -> None:
    """Prediction sink contract: JSON-lines {user_id, business_id, stars[,
    decision]} (``/root/reference/scripts/evaluate.py:5-7``)."""
    cols = [c for c in ("user_id", "business_id", "stars", "decision") if c in df.columns]
    write_json_lines(df.select(*cols), path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink — columnar interop output for Hive-side consumers."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, coalesce: int | None = None
) -> None:
    """CSV sink (the reference's item-CF weights contract was a CSV —
    ``/root/reference/models/item_cf_model.py:194``); distributed, not a
    driver pandas ``to_csv``."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leave every other partition of the target untouched — the
    incremental-load contract (daily re-materialization of one day's
    partition without rewriting the table). Spark's default overwrite
    mode ("static") would truncate the whole table first.

    The mode is set as a writer OPTION, not a session conf, so
    concurrent writers in the same session keep their own semantics.

    Scale: file layout is per-partition-value directories; downstream
    readers get partition pruning on ``partition_by`` for free."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
