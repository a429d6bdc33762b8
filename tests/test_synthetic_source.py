"""Custom Python DataSource: schema contract, partition-count
independence (the generator is counter-based, so the same rows come back
whatever the split), planted duplicates, and interop with the curation
operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


def _read(spark, **opts):  # noqa: F811
    from yelp_recommender_spark.sources.synthetic import register

    register(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_count(spark):  # noqa: F811
    df = _read(spark, rows=500, partitions=4)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string,"
        "n_chars:bigint>"
    )
    assert df.count() == 500
    assert df.select("doc_id").distinct().count() == 500


def test_partition_independence(spark):  # noqa: F811
    a = sorted(map(tuple, _read(spark, rows=800, partitions=16).collect()))
    b = sorted(map(tuple, _read(spark, rows=800, partitions=3).collect()))
    assert a == b


def test_planted_duplicates_and_dedup_interop(spark):  # noqa: F811
    df = _read(spark, rows=2000, partitions=8, dup_rate=0.2)
    dup_groups = (
        df.groupBy("text").count().filter(F.col("count") > 1).count()
    )
    assert dup_groups > 0
    # zero dup_rate plants nothing
    clean = _read(spark, rows=2000, partitions=8)
    assert (
        clean.groupBy("text").count().filter(F.col("count") > 1).count() == 0
    )
    # the exact-dedup operator consumes it unchanged
    winners = df.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = df.join(winners.select("doc_id"), "doc_id", "left_semi")
    assert kept.count() == df.select(F.md5("text")).distinct().count()


def test_read_json_quarantines_corrupt_lines(spark, tmp_path):  # noqa: F811
    """Malformed JSON lines must surface as quarantine rows (raw line in
    the corrupt column, NULL data fields), never crash the scan or
    silently vanish."""
    from pyspark.sql import types as T

    from yelp_recommender_spark.sources.readers import read_json

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "{broken json!!\n"
        '{"id": 3, "v": "also ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    df = read_json(spark, str(p), schema, corrupt_col="_bad").cache()
    good = df.filter("_bad IS NULL")
    quarantine = df.filter("_bad IS NOT NULL")
    assert {(r.id, r.v) for r in good.collect()} == {
        (1, "ok"),
        (3, "also ok"),
    }
    bad = quarantine.collect()
    assert len(bad) == 1 and bad[0]._bad.startswith("{broken")
    assert bad[0].id is None
    df.unpersist()

    # without the option the scan stays schema-only (no extra column)
    assert read_json(spark, str(p), schema).columns == ["id", "v"]
