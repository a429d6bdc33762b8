"""Sources (SURVEY.md §2.1 S1-S4).

The reference reads everything through RDD text scans with hand-rolled
partition sizing and header skipping:

- JSON-lines: ``textFile(...).map(json.loads)``
  (``/root/reference/utils/misc.py:41-46``)
- sized text scan: partitions = filesize // 10 MiB
  (``/root/reference/utils/misc.py:6,35-39``)
- CSV with ``zipWithIndex().filter(idx > 0)`` header skip
  (``/root/reference/utils/misc.py:48-56``)

Spark-native restatement: ``spark.read`` with explicit schemas. Partition
sizing is ``spark.sql.files.maxPartitionBytes`` + AQE (no code); header
handling is the CSV reader's; schema inference is banned in the hot path
(an inference pass at 100 TB reads the data twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Line-delimited JSON scan with a fixed schema (S1).

    ``mode=PERMISSIVE`` mirrors the reference's tolerance of missing keys
    (``dict.get(k, default)`` accesses): absent fields become nulls and
    are defaulted downstream with ``coalesce``.

    ``corrupt_col`` opts into QUARANTINE ingestion: malformed lines
    surface as rows whose other fields are NULL and whose ``corrupt_col``
    holds the raw line — so a 100-TB ingest neither crashes on one bad
    record (FAILFAST) nor silently drops it (DROPMALFORMED); the caller
    splits the frame on ``corrupt_col IS NULL`` and routes the quarantine
    to a dead-letter sink with full provenance.

    CAVEAT (Spark contract): a query may not reference ONLY the corrupt
    column of the raw scan (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN``) — ``.cache()`` the returned frame (as the tests do)
    or keep at least one data column in the quarantine projection before
    splitting.
    """
    if corrupt_col is None:
        return spark.read.schema(schema).json(path)
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw text scan (S2): one string column ``value`` per line."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan (S3). Explicit schema preferred; inference only for tests."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — the default columnar source; self-describing schema,
    predicate pushdown and column pruning for free."""
    return spark.read.parquet(path)


def load_stopwords(path: str | None = None) -> list[str]:
    """Stopword list (S4). The reference ships a 127-word file
    (``/root/reference/utils/stopwords``); we embed the same *public*
    English list via StopWordsRemover's default when no file is given.
    """
    if path is None:
        from pyspark.ml.feature import StopWordsRemover

        return StopWordsRemover.loadDefaultStopWords("english")
    with open(path) as fh:
        return [w.strip() for w in fh if w.strip()]


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the second columnar source (warehouse interop; Hive
    clusters hand data over as ORC as often as Parquet). Same free
    predicate pushdown / column pruning as the parquet path."""
    return spark.read.orc(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with SCHEMA EVOLUTION: long-lived ingest paths gain
    columns over time, and a default scan takes the schema from a single
    (arbitrary) footer — files written before the column silently lose
    or gain nothing and a mixed directory can even fail. ``mergeSchema``
    unions the footers' schemas; rows from pre-evolution files surface
    NULL for later columns, the standard additive-evolution contract.

    Scale note: footer merging touches every file's metadata at planning
    time — for 100-TB tables, prefer an explicit authoritative schema
    (``spark.read.schema(s).parquet(...)``) once evolution settles, and
    keep this reader for the migration window."""
    return spark.read.option("mergeSchema", "true").parquet(path)
