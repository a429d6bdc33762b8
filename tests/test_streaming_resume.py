"""Checkpoint-resume continuity: a watermarked streaming aggregation
stopped after half the backlog and RESTARTED from the same checkpoint
must emit exactly what an uninterrupted run emits — the state-store
restoration + offset-log contract that makes streaming jobs safely
restartable (none of the other streaming tests stop a query mid-backlog,
so state restore across process boundaries was untested)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)


def _run_availablenow(spark, stage, ckpt, out_dir):  # noqa: F811
    """Drain the backlog into a DURABLE (parquet) sink — the memory sink
    cannot recover from a checkpoint, and restartability is exactly what
    this test exercises. Returns all rows in the sink so far."""
    from yelp_recommender_spark.functions.eventtime import epoch_us
    from yelp_recommender_spark.streaming.ops import hourly_counts_stream

    schema = spark.read.parquet(stage).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    events = raw.withColumn(
        "event_ts", F.timestamp_micros(epoch_us(raw, "ts"))
    )
    q = (
        hourly_counts_stream(events)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return [tuple(r) for r in spark.read.parquet(out_dir).collect()]


def _stage_file(src_dir, dest, mtime):
    part = next(
        f for f in os.listdir(src_dir) if f.endswith(".parquet")
    )
    shutil.copy(os.path.join(src_dir, part), dest)
    os.utime(dest, (mtime, mtime))


def test_checkpoint_resume_equals_uninterrupted(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.functions.eventtime import with_ts_us
    from yelp_recommender_spark.sources.tables import load_tables

    ev = with_ts_us(load_tables(spark, SF_DIR, ["events"])["events"])
    med = ev.agg(
        F.percentile_approx("ts_us", F.lit(0.5), 10_000).alias("m")
    ).collect()[0].m
    early = ev.filter(F.col("ts_us") <= med).drop("ts_us")
    late = ev.filter(F.col("ts_us") > med).drop("ts_us")
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    early.coalesce(1).write.parquet(a_dir)
    late.coalesce(1).write.parquet(b_dir)

    # interrupted: file 1, stop, file 2 lands, resume from SAME checkpoint
    stage1 = str(tmp_path / "stage_resume")
    os.makedirs(stage1)
    ckpt = str(tmp_path / "ckpt_resume")
    out_resume = str(tmp_path / "out_resume")
    _stage_file(a_dir, os.path.join(stage1, "1.parquet"), 1_000_000)
    rows_run1 = _run_availablenow(spark, stage1, ckpt, out_resume)
    _stage_file(b_dir, os.path.join(stage1, "2.parquet"), 2_000_000)
    rows_final = _run_availablenow(spark, stage1, ckpt, out_resume)

    # uninterrupted: both files visible from the start, fresh checkpoint
    stage2 = str(tmp_path / "stage_oneshot")
    os.makedirs(stage2)
    _stage_file(a_dir, os.path.join(stage2, "1.parquet"), 1_000_000)
    _stage_file(b_dir, os.path.join(stage2, "2.parquet"), 2_000_000)
    rows_oneshot = _run_availablenow(
        spark,
        stage2,
        str(tmp_path / "ckpt_oneshot"),
        str(tmp_path / "out_oneshot"),
    )

    assert rows_run1, "first half emitted nothing — watermark never closed"
    assert len(rows_final) > len(rows_run1), (
        "resumed run emitted nothing — state/offsets not restored"
    )
    assert sorted(rows_final) == sorted(rows_oneshot)
