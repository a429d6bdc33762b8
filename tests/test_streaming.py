"""Streaming-vs-batch parity: each streaming op run with availableNow over
the sf0.001 events backlog must agree with its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)


def _batch_events(spark):  # noqa: F811
    from yelp_recommender_spark.functions.eventtime import epoch_us
    from yelp_recommender_spark.sources.tables import load_tables

    ev = load_tables(spark, SF_DIR, ["events"])["events"]
    return ev.withColumn("event_ts", F.timestamp_micros(epoch_us(ev, "ts")))


def test_hourly_counts_match_batch(spark):  # noqa: F811
    from yelp_recommender_spark.streaming import (
        hourly_counts_stream,
        read_events_stream,
        run_to_memory,
    )

    got = run_to_memory(
        hourly_counts_stream(read_events_stream(spark, SF_DIR)),
        "hourly",
        output_mode="append",
    )
    expect = (
        _batch_events(spark)
        .groupBy(F.window("event_ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    g = {(r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
         for r in got.collect()}
    e = {(r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
         for r in expect.collect()}
    # append mode emits a window only once the watermark passes its end:
    # emitted rows must equal their batch twins exactly, and the only
    # batch windows allowed to be missing are within the 2h+1h watermark
    # horizon of the stream's max event time.
    assert len(g) > 0
    assert all(e.get(k) == v for k, v in g.items()), "emitted row != batch"
    import datetime

    max_ts = _batch_events(spark).agg(F.max("event_ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=3)
    for k in set(e) - set(g):
        assert k[0] >= horizon, f"window {k} missing but before horizon"


def test_dedup_stream_one_row_per_key(spark):  # noqa: F811
    from yelp_recommender_spark.streaming import (
        dedup_stream,
        read_events_stream,
        run_to_memory,
    )

    got = run_to_memory(
        dedup_stream(read_events_stream(spark, SF_DIR)), "dedup"
    )
    # exactly one survivor per (user_id, event_type), covering every key
    per_key = got.groupBy("user_id", "event_type").count()
    assert per_key.filter("count > 1").count() == 0
    n_keys = (
        _batch_events(spark).select("user_id", "event_type").distinct().count()
    )
    assert got.count() == n_keys


def test_sessionize_stream_matches_batch_session_count(spark):  # noqa: F811
    from yelp_recommender_spark.streaming import (
        read_events_stream,
        run_to_memory,
        sessionize_stream,
    )

    got = run_to_memory(
        sessionize_stream(read_events_stream(spark, SF_DIR)), "sessions"
    )
    # batch twin: session_window in a batch aggregation (same semantics)
    expect = (
        _batch_events(spark)
        .groupBy(F.session_window("event_ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    import datetime

    g = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }
    e = {
        (
            r.user_id,
            r["session_window"].start,
            r["session_window"].end,
            r.n_events,
        )
        for r in expect.collect()
    }
    # emitted sessions must be exactly their batch twins; only sessions
    # ending inside the watermark horizon may be withheld (append mode)
    assert len(g) > 0 and g <= e
    max_ts = _batch_events(spark).agg(F.max("event_ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=3)
    for s in e - g:
        assert s[2] >= horizon, f"session {s} missing but before horizon"


def test_sliding_counts_match_batch(spark):  # noqa: F811
    """Sliding windows (1h every 15min): every emitted window must equal
    its batch twin, each event landing in 4 overlapping windows."""
    import datetime

    from yelp_recommender_spark.streaming import (
        read_events_stream,
        run_to_memory,
        sliding_counts_stream,
    )

    got = run_to_memory(
        sliding_counts_stream(read_events_stream(spark, SF_DIR)),
        "sliding",
        output_mode="append",
    )
    expect = (
        _batch_events(spark)
        .groupBy(F.window("event_ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    g = {
        (r.window_start, r.window_end, r.event_type): r.n_events
        for r in got.collect()
    }
    e = {
        (r.window_start, r.window_end, r.event_type): r.n_events
        for r in expect.collect()
    }
    assert len(g) > 0
    assert all(e.get(k) == v for k, v in g.items()), "emitted != batch"
    # overlap factor sanity: ~4x the events of a tumbling decomposition
    max_ts = _batch_events(spark).agg(F.max("event_ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=3, minutes=15)
    for k in set(e) - set(g):
        assert k[0] >= horizon, f"window {k} missing but before horizon"


def test_running_totals_stateful_matches_batch(spark):  # noqa: F811
    """applyInPandasWithState custom operator: after draining the
    backlog, the last changelog emission per key equals the batch
    groupBy count/sum."""
    from yelp_recommender_spark.streaming import (
        read_events_stream,
        run_to_memory,
    )
    from yelp_recommender_spark.streaming.ops import running_totals_stream

    got = run_to_memory(
        running_totals_stream(read_events_stream(spark, SF_DIR)),
        "running_totals",
        output_mode="update",
    )
    # the changelog may hold several emissions per key (one per
    # micro-batch that touched it); the LAST (max n_events) is the total
    latest = {}
    for r in got.collect():
        k = (r.user_id, r.event_type)
        if k not in latest or r.n_events > latest[k][0]:
            latest[k] = (r.n_events, round(r.total_value, 6))
    expect = {
        (r.user_id, r.event_type): (r.n, round(r.s, 6))
        for r in _batch_events(spark)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert latest == expect


def test_streaming_topk_foreachbatch(spark):  # noqa: F811
    import os
    import tempfile
    import uuid

    from yelp_recommender_spark.streaming import read_events_stream
    from yelp_recommender_spark.streaming.ops import (
        top_events_per_window_foreachbatch,
    )

    agg, batch_fn, results = top_events_per_window_foreachbatch(
        read_events_stream(spark, SF_DIR), k=2
    )
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_topk_{uuid.uuid4().hex[:8]}")
    q = (
        agg.writeStream.foreachBatch(batch_fn)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert results, "foreachBatch never ran"
    per_window: dict = {}
    for r in results:
        per_window[r.window_start] = per_window.get(r.window_start, 0) + 1
    assert per_window and all(v <= 2 for v in per_window.values())


def test_attribution_join_matches_batch(spark):  # noqa: F811
    """Stream-stream interval join over a one-file backlog equals the
    batch self-join exactly (single micro-batch: no buffered row can be
    evicted before its match arrives — see q72's docstring for why the
    inner-join emission set is then complete)."""
    from yelp_recommender_spark.streaming import (
        attribution_join_stream,
        read_events_stream,
        run_to_memory,
    )

    got = run_to_memory(
        attribution_join_stream(
            read_events_stream(spark, SF_DIR),
            trigger_type="view",
            convert_type="purchase",
            horizon="1 hour",
        ),
        "attr",
        output_mode="append",
    )
    ev = _batch_events(spark)
    trig = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("trigger_event_id"),
        F.col("event_ts").alias("trigger_ts"),
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("convert_event_id"),
        F.col("event_ts").alias("convert_ts"),
    )
    expect = conv.join(
        trig,
        F.expr(
            "user_id = t_user AND trigger_ts <= convert_ts"
            " AND trigger_ts >= convert_ts - INTERVAL 1 hour"
        ),
    ).select("user_id", "trigger_event_id", "convert_event_id")
    g = {(r.user_id, r.trigger_event_id, r.convert_event_id) for r in got.collect()}
    e = {(r.user_id, r.trigger_event_id, r.convert_event_id) for r in expect.collect()}
    assert g == e and len(g) > 0


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas state server needs google.protobuf "
    "(absent in this container; runs on standard cluster images)",
)
def test_distinct_types_stream_batch_parity(spark):  # noqa: F811
    """transformWithStateInPandas changelog: the final emission per user
    equals the batch countDistinct over the same backlog."""
    from pyspark.sql import functions as F

    from yelp_recommender_spark.sources.tables import load_tables
    from yelp_recommender_spark.streaming.ops import (
        distinct_types_stream,
        read_events_stream,
        run_to_memory,
    )

    out = run_to_memory(
        distinct_types_stream(read_events_stream(spark, SF_DIR)),
        "t_types",
        output_mode="update",
    )
    # single-file backlog = one micro-batch = one changelog row per user
    got = {(r.user_id, r.n_types) for r in out.collect()}
    batch = load_tables(spark, SF_DIR, ["events"])["events"]
    want = {
        (r.user_id, r.n)
        for r in batch.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    assert got == want


def test_incremental_dedup_stream_batch_parity(spark, tmp_path):  # noqa: F811
    """foreachBatch streaming dedup emits exactly the docs the batch
    operator would keep: novel(stream) == batch \\ rejected(batch op),
    for the same corpus index. A single-file backlog = one micro-batch,
    so within-batch keep-first semantics match the batch run exactly."""
    from pyspark.sql import functions as F

    from yelp_recommender_spark.operators.dedup import (
        incremental_minhash_dedup,
    )
    from yelp_recommender_spark.queries.dedup import _doc_shingles
    from yelp_recommender_spark.streaming.ops import (
        incremental_dedup_stream,
        read_docs_stream,
    )

    sh = _doc_shingles(spark, SF_DIR)
    corpus = sh.filter(F.col("doc_id") % 10 < 8)
    batch_sh = sh.filter(F.col("doc_id") % 10 >= 8)

    out = str(tmp_path / "novel")
    incremental_dedup_stream(
        read_docs_stream(spark, SF_DIR).filter(F.col("doc_id") % 10 >= 8),
        corpus,
        out,
    )
    got_novel = {r.doc_id for r in spark.read.parquet(out).collect()}

    rejected = {
        r.doc_id
        for r in incremental_minhash_dedup(
            batch_sh, corpus, n_hashes=16, bands=8, threshold=0.8, fast=True
        ).collect()
    }
    all_stream = {
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % 10 >= 8)
        .collect()
    }
    assert got_novel == all_stream - rejected


def test_attribution_outer_join_watermark_frontier(spark):  # noqa: F811
    """Left-outer stream-stream join: matched pairs equal the batch
    inner join; null-match rows emit ONLY for conversions strictly older
    than the final watermark (min of both sides' max event time − the
    2h delay) — younger nulls are withheld, which is the state-eviction
    contract, not data loss."""
    import datetime

    from yelp_recommender_spark.streaming import (
        attribution_join_outer_stream,
        read_events_stream,
        run_to_memory,
    )

    got = run_to_memory(
        attribution_join_outer_stream(
            read_events_stream(spark, SF_DIR), horizon="1 hour"
        ),
        "attr_outer_t",
        output_mode="append",
    )
    g_match = {
        (r.user_id, r.convert_event_id, r.trigger_event_id)
        for r in got.filter(F.col("trigger_event_id").isNotNull()).collect()
    }
    g_null = {
        (r.user_id, r.convert_event_id)
        for r in got.filter(F.col("trigger_event_id").isNull()).collect()
    }

    ev = _batch_events(spark)
    trig = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("trigger_event_id"),
        F.col("event_ts").alias("trigger_ts"),
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("convert_event_id"),
        F.col("event_ts").alias("convert_ts"),
    )
    cond = F.expr(
        "user_id = t_user AND trigger_ts <= convert_ts"
        " AND trigger_ts >= convert_ts - INTERVAL 1 hour"
    )
    e_match = {
        (r.user_id, r.convert_event_id, r.trigger_event_id)
        for r in conv.join(trig, cond).collect()
    }
    assert g_match == e_match and g_match

    wm = min(
        trig.agg(F.max("trigger_ts")).head()[0],
        conv.agg(F.max("convert_ts")).head()[0],
    ) - datetime.timedelta(hours=2)
    nulls = conv.join(trig, cond, "leftOuter").filter(
        F.col("trigger_event_id").isNull()
    )
    e_null = {
        (r.user_id, r.convert_event_id)
        for r in nulls.filter(F.col("convert_ts") < F.lit(wm)).collect()
    }
    withheld = {
        (r.user_id, r.convert_event_id)
        for r in nulls.filter(F.col("convert_ts") >= F.lit(wm)).collect()
    }
    assert g_null == e_null and g_null
    assert not (g_null & withheld)
