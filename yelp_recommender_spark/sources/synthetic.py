"""Custom Python DataSource (PySpark 4.x ``pyspark.sql.datasource`` API):
a deterministic synthetic document corpus generated IN the executors.

Why this exists: sizing experiments for the curation pipeline need
corpora far larger than any fixture worth storing. A generating source
makes "100 TB of documents" a read option instead of a dataset — each
input partition derives its rows from (partition_index, row_index) alone,
so generation is embarrassingly parallel, repeatable across runs and
cluster shapes, and requires zero I/O. This is also the engine's
demonstration of Spark's source-extension surface (SURVEY §2.1 covers
the built-in scans; this is the "bring your own source" path).

Usage::

    from yelp_recommender_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 100_000).option("partitions", 64)
          .option("dup_rate", 0.1).load())

Schema matches the testdata ``documents`` table (doc_id, text, lang,
source, n_chars) so every curation operator runs on it unchanged.

Scale notes: ``partitions()`` returns one lightweight InputPartition per
split — Spark schedules them like file splits; there is no driver-side
row materialization. The row generator is a counter-based hash
(splitmix-style) — no RNG state to share, any row recomputable anywhere.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_SCHEMA_DDL = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "order data column join small line customer query big stream group "
    "sort window filter vector the a"
).split()
_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]


def _mix(x: int) -> int:
    """splitmix64 finalizer — the counter-based hash behind every field."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _doc(doc_id: int, dup_rate_pct: int):
    # a dup_rate% slice of docs clones the text of an earlier doc —
    # planted duplicates for dedup experiments. Seeds are drawn ONLY
    # from ids 0-99, which the doc_id > 100 guard exempts from
    # remapping: the clone therefore always matches its seed's FINAL
    # text (a seed that could itself remap would make the "duplicate"
    # match nothing). Corollary: a corpus of ≤ 101 rows plants no
    # duplicates — use more rows for dedup experiments.
    seed_id = doc_id
    if dup_rate_pct and doc_id > 100 and _mix(doc_id * 7 + 1) % 100 < dup_rate_pct:
        seed_id = _mix(doc_id) % 100
    h = _mix(seed_id)
    n_words = 20 + h % 80
    words = [
        _WORDS[_mix(seed_id * 131 + i) % len(_WORDS)] for i in range(n_words)
    ]
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[_mix(doc_id * 3 + 2) % len(_LANGS)],
        f"src{_mix(doc_id * 5 + 3) % 20}",
        len(text),
    )


class _Split(InputPartition):
    def __init__(self, start: int, end: int, dup_rate_pct: int):
        self.start = start
        self.end = end
        self.dup_rate_pct = dup_rate_pct


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.n_parts = int(options.get("partitions", 8))
        self.dup_rate_pct = int(
            round(float(options.get("dup_rate", 0.0)) * 100)
        )

    def partitions(self):
        per = max(1, -(-self.rows // self.n_parts))  # ceil division
        return [
            _Split(lo, min(lo + per, self.rows), self.dup_rate_pct)
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Split):
        for doc_id in range(partition.start, partition.end):
            yield _doc(doc_id, partition.dup_rate_pct)


class SyntheticDocsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Register the source for ``spark.read.format('synthetic_docs')``."""
    spark.dataSource.register(SyntheticDocsSource)
