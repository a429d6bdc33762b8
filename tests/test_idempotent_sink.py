"""Idempotent streaming sink (streaming/ops.idempotent_parquet_sink) and
schema-evolution reader (sources/readers.read_parquet_evolving)."""

from __future__ import annotations

from tests.conftest import spark  # noqa: F401 (fixture)


def test_replayed_batch_does_not_duplicate(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.streaming.ops import idempotent_parquet_sink

    path = str(tmp_path / "sink")
    sink = idempotent_parquet_sink(path)

    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")

    sink(b0, 0)
    sink(b1, 1)
    # failure replay: batch 1 is re-delivered with the same id — content
    # must converge, not append
    sink(b1, 1)

    got = sorted(
        (r.id, r.v, r.batch_id)
        for r in spark.read.parquet(path).collect()
    )
    assert got == [(1, "a", 0), (2, "b", 0), (3, "c", 1)]


def test_replay_overwrites_only_its_own_partition(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.streaming.ops import idempotent_parquet_sink

    path = str(tmp_path / "sink2")
    sink = idempotent_parquet_sink(path)
    sink(spark.createDataFrame([(1,)], "id long"), 0)
    sink(spark.createDataFrame([(2,)], "id long"), 1)
    # replay of batch 0 with corrected content: batch 1 untouched
    sink(spark.createDataFrame([(9,)], "id long"), 0)

    got = sorted(
        (r.id, r.batch_id) for r in spark.read.parquet(path).collect()
    )
    assert got == [(2, 1), (9, 0)]


def test_read_parquet_evolving_merges_added_column(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.sources.readers import read_parquet_evolving

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        path
    )
    spark.createDataFrame(
        [(2, "b", 7.5)], "id long, v string, score double"
    ).write.mode("append").parquet(path)

    df = read_parquet_evolving(spark, path)
    assert set(df.columns) == {"id", "v", "score"}
    got = {r.id: (r.v, r.score) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("b", 7.5)}
