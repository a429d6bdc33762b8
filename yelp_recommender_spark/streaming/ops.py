"""Streaming operators over the events table.

Scale notes (the whole point of the streaming surface):

- State stores are keyed by the aggregation/window key; watermarks bound
  state size — without them a 100 TB/day stream accumulates unbounded
  per-key state. Every stateful op here takes an explicit watermark.
- ``availableNow`` runs the same incremental plan over a bounded backlog
  (the batch-parity mode used in tests and backfills).
- Top-k is not incrementally expressible inside a streaming aggregate
  (rank over an update stream); the standard pattern is foreachBatch —
  each micro-batch applies the *batch* top-k operator to the updated
  window aggregates.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet physical schema (streaming sources require an explicit
# schema). ts is INT64 TIMESTAMP(NANOS): declared TIMESTAMP_NTZ — the
# type Spark 4.1+ reads it as natively. NEVER declare it LongType on
# 4.1+: it would silently fill µs (the internal representation) where
# the legacy nanosAsLong conf used to yield ns — a 1000× unit change.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Declared streaming schema chosen at RUNTIME by probing how a batch
    read surfaces the ts column (ADVICE r3: a hard TIMESTAMP_NTZ schema
    is 4.1-only — pre-4.1 scans reject NANOS or, under the legacy conf,
    surface LONG raw nanos). The probe reads only the parquet footer (no
    job); downstream code goes through :func:`epoch_us`, which already
    dispatches on the observed type, so both representations flow through
    identically."""
    from yelp_recommender_spark.sources.tables import load_tables

    ts_type = (
        load_tables(spark, sf_dir, ["events"])["events"].schema["ts"].dataType
    )
    return T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", ts_type)
            for f in EVENTS_SCHEMA.fields
        ]
    )


def sized_state_partitions(
    spark: SparkSession,
    sf_dir: str,
    bytes_per_partition: int = 32 * 1024 * 1024,
) -> int:
    """State-store partition count derived from the events BACKLOG SIZE
    (the staged parquet bytes) instead of a constant: every stateful
    stage commits one state-store delta PER PARTITION per micro-batch,
    so a modest backlog at the old min(parallelism, 8) default paid
    mostly commit overhead (interleaved A/B at sf0.1: 2 partitions beat
    8 on every JVM-stateful query — hourly counts 2.7→2.2 s, dedup
    2.2→1.2 s, sessions 4.9→3.0 s, attribution 4.7→2.9 s), while a
    backlog past ``bytes_per_partition``·parallelism sizes back to full
    parallelism — the same rule a production backfill would use.
    Clamped to [2, defaultParallelism]; live high-throughput streams
    should still pass an explicit ``state_partitions`` sized to their
    peak per-batch volume (:func:`run_to_memory`'s contract).

    NOT used by the ``applyInPandasWithState`` op (q63): its per-batch
    cost is the Python state kernel, which WANTS parallelism — measured
    2× slower at 2 partitions on the same backlog."""
    src = os.path.join(sf_dir, "events.parquet")
    try:
        nbytes = (
            sum(
                os.path.getsize(os.path.join(src, f))
                for f in os.listdir(src)
            )
            if os.path.isdir(src)
            else os.path.getsize(src)
        )
    except OSError:
        nbytes = 0
    par = spark.sparkContext.defaultParallelism
    return max(2, min(par, -(-nbytes // max(int(bytes_per_partition), 1))))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet with a real event-time
    column (``event_ts`` timestamp derived from the nano epoch).

    The file source requires a *directory*; the testdata table is a single
    file, so it is staged (symlinked, read-only) into a scratch dir. On a
    cluster this would be Kafka/Kinesis or a landing directory; the file
    source exercises identical incremental semantics."""
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        stream_dir = src
    else:
        # stable digest (not Python's per-process-randomized hash()) so
        # reruns reuse one staging dir instead of leaking a new one each
        digest = hashlib.md5(src.encode()).hexdigest()[:8]
        stream_dir = os.path.join(
            tempfile.gettempdir(), f"events_stream_{digest}"
        )
        os.makedirs(stream_dir, exist_ok=True)
        link = os.path.join(stream_dir, "events.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
    raw = (
        spark.readStream.schema(events_stream_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    # event_ts: epoch-based TIMESTAMP for watermarks/windows (tz-neutral —
    # window boundaries are epoch arithmetic); derived via the
    # representation-agnostic epoch-µs contract.
    from yelp_recommender_spark.functions.eventtime import epoch_us

    return raw.withColumn("event_ts", F.timestamp_micros(epoch_us(raw, "ts")))


def hourly_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour window counts/sums per event_type — the streaming
    twin of q16. Watermark bounds the window state; late rows beyond it
    are dropped (documented divergence from batch, which sees everything).
    """
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """SLIDING-window counts per event_type (each event lands in
    window/slide overlapping windows — here 4). Same watermark-bounded
    state story as the tumbling twin (:func:`hourly_counts_stream`);
    state size scales by the overlap factor, which is why the slide is a
    parameter and not a default-on behavior. Batch-parity pinned by
    tests/test_streaming.py."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on (user_id, event_type) —
    ``dropDuplicatesWithinWatermark`` keeps the dedup state bounded by the
    watermark horizon (the streaming twin of q30's keep-first; within a
    micro-batch the earliest-arriving row wins)."""
    return events.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions per user via ``session_window`` — the native
    streaming form of q18's lag-based batch sessionization. Emits one row
    per closed session: (user_id, session_start, session_end, n_events).
    """
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def top_events_per_window_foreachbatch(
    events: DataFrame,
    k: int = 3,
    watermark: str = "2 hours",
):
    """Streaming top-k event types per hour window: windowed counts with
    a foreachBatch sink that applies the batch per-key top-N operator to
    each micro-batch's updates. Returns (aggregated_stream, batch_fn);
    caller wires ``.writeStream.foreachBatch(batch_fn)`` to a sink."""
    from yelp_recommender_spark.operators.topk import top_n_per_key

    agg = (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )

    results: list = []

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        # must consume the FULL batch (state-store commit validation);
        # the top-k result is window-count-bounded, so collecting it is
        # the sink write, not a driver bottleneck
        top = top_n_per_key(
            batch_df, ["window_start"], "n", k, tiebreak="event_type"
        )
        results.extend(top.collect())

    return agg, batch_fn, results


def running_totals_stream(events: DataFrame) -> DataFrame:
    """CUSTOM STATEFUL operator via ``applyInPandasWithState`` — the
    escape hatch for stateful logic Spark's built-in streaming aggregates
    can't express (here: per-(user, event_type) running count/sum emitted
    as every micro-batch updates them, i.e. a changelog of cumulative
    totals rather than a windowed aggregate).

    State is one (n, sum) pair per key — O(keys), watermark-free by
    design (totals never expire; a TTL variant would pass a
    GroupStateTimeout). Arrow-batched: each key's rows arrive as pandas
    frames, the update is two vectorized reductions.

    Batch parity: after draining a bounded backlog the final emission per
    key equals the batch ``groupBy(user_id, event_type).agg(count, sum)``
    — pinned by tests/test_streaming.py."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        user_id, event_type = key
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "event_type": event_type,
                    "n_events": n,
                    "total_value": s,
                }
            ]
        )

    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def distinct_types_stream(events: DataFrame) -> DataFrame:
    """Per-user distinct-event-type tracker via
    ``transformWithStateInPandas`` — Spark 4's arbitrary-state API (the
    successor to ``applyInPandasWithState``, cf.
    :func:`running_totals_stream`): an explicit ``ValueState`` per key
    holds the sorted distinct set; every micro-batch that grows a key's
    set emits the updated membership as a changelog row.

    Why the new API matters at scale: named state cells (value/list/map)
    are individually addressable in the state store — an operator can
    keep several small states per key without serializing one blob, TTL
    is declarative per state (``ttlDurationMs``), and timers enable
    time-driven emission without watermark tricks. Here one ValueState
    suffices; the set is bounded by the event-type vocabulary.

    Batch parity: after draining a bounded backlog the final emission
    per user equals ``groupBy(user).agg(countDistinct(event_type))`` —
    pinned by tests/test_streaming.py WHERE THE RUNTIME SUPPORTS IT: the
    API's state server speaks protobuf between JVM and a dedicated
    Python driver worker, so it needs a functional ``google.protobuf``
    (not in this container — the parity test skips itself there and runs
    on any standard cluster image; :func:`running_totals_stream` is the
    applyInPandasWithState fallback with no extra dependency)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class DistinctTypes(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "types string")

        def handleInputRows(self, key, rows, timer_values):
            prev = self._seen.get()
            seen = set(prev[0].split(",")) if prev and prev[0] else set()
            for pdf in rows:
                seen.update(pdf["event_type"].unique().tolist())
            val = ",".join(sorted(seen))
            self._seen.update((val,))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_types": len(seen),
                        "types": val,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=DistinctTypes(),
            outputStructType="user_id bigint, n_types int, types string",
            outputMode="Update",
            timeMode="None",
        )
    )


def attribution_join_stream(
    events: DataFrame,
    trigger_type: str = "view",
    convert_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join — the attribution/funnel shape: pair
    each ``convert_type`` event with every ``trigger_type`` event by the
    SAME user in the preceding ``horizon`` (inclusive bounds). Emits
    (user_id, trigger_event_id, convert_event_id, trigger_ts, convert_ts,
    lag_seconds).

    Both inputs are watermarked and the join condition carries an explicit
    time-range predicate — the two things that make a stream-stream join's
    state BOUNDED: Spark can discard a buffered trigger row once the
    watermark passes ``trigger_ts + horizon`` (without the range predicate
    each side buffers forever waiting for arbitrarily-late matches; state
    grows with the stream). Inner join: emission waits for the matching
    row, not the watermark, so results stream out as matches arrive.

    Scale: state per side ≈ rows within the watermark+horizon span,
    keyed/shuffled on user_id. At 100 TB/day the horizon IS the state
    budget — widen it consciously.

    Batch parity: equals the batch self-join with the same predicate over
    a bounded backlog (pinned by tests/test_streaming.py)."""
    trig = (
        events.filter(F.col("event_type") == trigger_type)
        .select(
            F.col("user_id").alias("t_user"),
            F.col("event_id").alias("trigger_event_id"),
            F.col("event_ts").alias("trigger_ts"),
        )
        .withWatermark("trigger_ts", watermark)
    )
    conv = (
        events.filter(F.col("event_type") == convert_type)
        .select(
            "user_id",
            F.col("event_id").alias("convert_event_id"),
            F.col("event_ts").alias("convert_ts"),
        )
        .withWatermark("convert_ts", watermark)
    )
    joined = conv.join(
        trig,
        F.expr(
            f"""
            user_id = t_user
            AND trigger_ts <= convert_ts
            AND trigger_ts >= convert_ts - INTERVAL {horizon}
            """
        ),
    )
    return joined.select(
        "user_id",
        "trigger_event_id",
        "convert_event_id",
        "trigger_ts",
        "convert_ts",
        (
            (F.unix_micros("convert_ts") - F.unix_micros("trigger_ts"))
            .cast("double")
            / F.lit(1_000_000.0)
        ).alias("lag_seconds"),
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """STREAM-STATIC enrichment join — each streaming event joined to a
    static dimension table (inner). No watermark is required: the static
    side is not stateful (Spark re-plans it per micro-batch), so nothing
    buffers and emission equals the batch join over any backlog — which
    is why this entry is FULLY oracle-checkable, unlike the windowed ops.

    Scale: the broadcast hint is applied only when the dimension's
    plan-stats size fits the session's broadcast threshold — a forced
    hint would collect an arbitrarily large dimension to the driver
    every micro-batch. Above the threshold the join plans unhinted
    (shuffled per micro-batch) — at that point pre-bucket the dimension
    or pin it with a persist, same knobs as batch."""
    from yelp_recommender_spark.operators.ann import estimated_size_bytes

    d = dim.withColumnRenamed(dim_key, on) if dim_key != on else dim
    size = estimated_size_bytes(d)
    if size is not None and 0 < size <= (64 << 20):
        d = F.broadcast(d)
    # above the guard (or with unknown stats) the hint is omitted —
    # Catalyst still auto-broadcasts under its own threshold, and a
    # genuinely large dimension shuffles instead of OOMing the driver
    return events.join(d, on, "inner")


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_s: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the available
    backlog (``trigger(availableNow=True)``) into an in-memory table and
    return it as a batch DataFrame — the test/backfill harness.

    The state-store partition count is fixed by
    ``spark.sql.shuffle.partitions`` at FIRST start for a checkpoint;
    since this harness always starts fresh checkpoints, it pins that
    count for the query's duration and restores the conf after. Results
    are partition-count-independent; only task counts change.

    Sizing: every stateful stage commits one state-store delta PER
    PARTITION per micro-batch, so over-parallelizing a modest backlog
    makes commit overhead dominate (measured on local[32]: 32 state
    partitions ran the hourly-counts backlog ~2× slower than 8). The
    default pins min(parallelism, 8) — right for bounded backfills and
    tests; a live high-throughput stream should pass an explicit
    ``state_partitions`` sized to its peak per-batch volume instead."""
    spark = stream_df.sparkSession
    name = f"{query_name}_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is None:
        state_partitions = min(spark.sparkContext.defaultParallelism, 8)
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # the memory sink holds the result; the drained checkpoint is dead
    # weight (each run creates a fresh one — they'd accumulate forever)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def incremental_dedup_stream(
    docs_stream: DataFrame,
    corpus_shingled: DataFrame,
    out_path: str,
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    shingle_k: int = 3,
    timeout_s: int = 300,
    state_partitions: int | None = None,
    fast: bool = True,
) -> None:
    """Streaming ingest dedup — the production shape of
    ``incremental_minhash_dedup``: each micro-batch of incoming
    documents is MinHash-matched against the static corpus index via a
    foreachBatch sink, and only the NOVEL documents are appended to
    ``out_path`` (parquet). foreachBatch is the standard pattern here
    because the per-batch logic is a batch join pipeline (band join +
    Jaccard verify + anti-join) that append-mode streaming aggregation
    cannot express; exactly-once comes from availableNow + checkpoint +
    idempotent-per-batch appends.

    Semantics note: the dedup partner set per batch doc is the CORPUS
    plus smaller-id docs of the SAME micro-batch (the operator's
    keep-first rule); novel docs of earlier micro-batches are not added
    to the index mid-stream — a production loop appends each cycle's
    surviving signatures to the corpus index between cycles, exactly as
    the operator docstring describes.

    Scale: corpus band keys are computed from the persisted shingle
    table (an ingest pipeline stores the signature index instead —
    map-only either way); per batch the join cost is batch × indexed
    keys, never corpus × corpus."""
    from yelp_recommender_spark.functions.text import tokens_col
    from yelp_recommender_spark.operators.dedup import (
        incremental_minhash_dedup,
        token_shingles,
    )

    spark = docs_stream.sparkSession

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        from yelp_recommender_spark.cache import clear_caches, registry_mark

        # the dedup pipeline registers per-batch caches (signature
        # tables); release them once this batch's output is on disk —
        # a long-running stream must not accumulate one cache per batch
        mark = registry_mark()
        try:
            sh = (
                batch_df.withColumn("toks", tokens_col("text"))
                .filter(F.size("toks") >= shingle_k)
                .withColumn("shingles", token_shingles("toks", k=shingle_k))
            )
            dups = incremental_minhash_dedup(
                sh,
                corpus_shingled,
                n_hashes=n_hashes,
                bands=bands,
                threshold=threshold,
                fast=fast,
            ).select("doc_id")
            novel = batch_df.join(dups, "doc_id", "left_anti")
            novel.write.mode("append").parquet(out_path)
        finally:
            clear_caches(since=mark)

    name = f"incdedup_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is None:
        state_partitions = min(spark.sparkContext.defaultParallelism, 8)
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            docs_stream.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    shutil.rmtree(ckpt, ignore_errors=True)


def read_docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (same read-only
    symlink staging as :func:`read_events_stream` — the file source
    requires a directory)."""
    from yelp_recommender_spark.schemas import TESTDATA_SCHEMAS

    src = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(src):
        stream_dir = src
    else:
        digest = hashlib.md5(src.encode()).hexdigest()[:8]
        stream_dir = os.path.join(
            tempfile.gettempdir(), f"docs_stream_{digest}"
        )
        os.makedirs(stream_dir, exist_ok=True)
        link = os.path.join(stream_dir, "documents.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
    return (
        spark.readStream.schema(TESTDATA_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )


def idempotent_parquet_sink(path: str):
    """foreachBatch sink whose CONTENT is exactly-once under micro-batch
    replays. After a failure, Structured Streaming re-runs the last
    uncommitted batch with the SAME batch_id; a plain ``mode("append")``
    sink (cf. ``incremental_dedup_stream``'s note) then duplicates that
    batch's rows — at-least-once. Writing every batch into its own
    ``batch_id=N`` partition with DYNAMIC partition overwrite turns a
    replay into a rewrite of exactly that partition: other batches'
    partitions are untouched, re-delivery converges to the same bytes,
    and downstream batch readers see each record once.

    This is the table-format-free version of what transactional sinks do
    with commit logs; it requires only a filesystem with atomic directory
    rename. Returns the ``batch_fn`` to pass to
    ``writeStream.foreachBatch``.

    Scale: the overwrite scopes to the arriving partition (never the
    table), and batch_id partitioning composes with
    :func:`~yelp_recommender_spark.operators.compact.compact_parquet`
    for the periodic small-file sweep the per-batch layout implies.
    """

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return batch_fn


def attribution_join_outer_stream(
    events: DataFrame,
    trigger_type: str = "view",
    convert_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join — ``attribution_join_stream``
    with unconverted-conversion visibility: every ``convert_type`` event
    eventually emits, with NULL trigger columns when no ``trigger_type``
    event preceded it within ``horizon``.

    The semantic difference from the inner join is WHEN the null row can
    be emitted: only once the watermark proves no matching trigger can
    still arrive (any trigger with ``trigger_ts <= convert_ts`` would by
    then be later than the watermark allows). So outer results trail the
    watermark by design — and rows younger than the final watermark at
    stream end remain unemitted, which is correct, not lossy: the stream
    hasn't proven their non-match yet. The parity test pins exactly this
    frontier: matched rows equal the batch join; emitted null rows equal
    the batch left-join nulls OLDER than the final watermark.

    State bounds are identical to the inner form (watermark + explicit
    time-range predicate ⇒ eviction at ``trigger_ts + horizon``)."""
    trig = (
        events.filter(F.col("event_type") == trigger_type)
        .select(
            F.col("user_id").alias("t_user"),
            F.col("event_id").alias("trigger_event_id"),
            F.col("event_ts").alias("trigger_ts"),
        )
        .withWatermark("trigger_ts", watermark)
    )
    conv = (
        events.filter(F.col("event_type") == convert_type)
        .select(
            "user_id",
            F.col("event_id").alias("convert_event_id"),
            F.col("event_ts").alias("convert_ts"),
        )
        .withWatermark("convert_ts", watermark)
    )
    joined = conv.join(
        trig,
        F.expr(
            f"""
            user_id = t_user
            AND trigger_ts <= convert_ts
            AND trigger_ts >= convert_ts - INTERVAL {horizon}
            """
        ),
        "leftOuter",
    )
    return joined.select(
        "user_id",
        "convert_event_id",
        "convert_ts",
        "trigger_event_id",
        "trigger_ts",
    )


# ---------------------------------------------------------------------
# Standing sketch summaries over a stream (mergeable-state maintenance)
# ---------------------------------------------------------------------


def _committed_summary_batches(state_path: str) -> list[int]:
    """batch_ids with a fully-written state version (``_SUCCESS``
    present — a torn write from a crash mid-batch has no marker and is
    invisible to readers; its replay overwrites the same dir)."""
    if not os.path.isdir(state_path):
        return []
    out = []
    for d in os.listdir(state_path):
        if d.startswith("batch_id=") and os.path.exists(
            os.path.join(state_path, d, "_SUCCESS")
        ):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def latest_summary(
    spark: SparkSession, state_path: str, before: int | None = None
) -> DataFrame | None:
    """The newest committed summary state (optionally the newest
    STRICTLY BEFORE a batch_id — what a replaying batch must read so it
    never consumes its own partial output). None when no version has
    committed yet."""
    ids = _committed_summary_batches(state_path)
    if before is not None:
        ids = [i for i in ids if i < before]
    if not ids:
        return None
    return spark.read.parquet(
        os.path.join(state_path, f"batch_id={ids[-1]}")
    )


def summary_apply_batch(
    state_path: str,
    batch_df: DataFrame,
    batch_id: int,
    build_fn,
    merge_fn,
    keep_last: int = 2,
) -> None:
    """One exactly-once step of standing-summary maintenance:
    ``state(N) = merge(state(M), build(batch))`` with M the newest
    committed version < N, written to ``batch_id=N`` and committed by
    the write's own ``_SUCCESS`` marker.

    Replay-safe for ANY sketch, linear ones included: a re-delivered
    batch re-reads the same prior version M (never its own torn
    output) and overwrites ``batch_id=N`` with identical bytes — the
    versioned state is what makes a count-min/histogram stream
    exactly-once, where merging into a single mutable state table
    would double-count every replay. (HLL union happens to be
    idempotent by algebra, but the discipline here doesn't rely on
    that.)

    After a successful commit, versions older than the newest
    ``keep_last`` are vacuumed — ``keep_last >= 2`` retains the replay
    anchor M alongside N; state size is O(keys), so retention is
    cheap.

    Raises on a batch_id BELOW the newest committed version: that only
    happens when a stream restarts against this state with a FRESH
    checkpoint (Structured Streaming batch ids restart at 0), and
    folding restarted ids in silently would vacuum and overwrite live
    versions while readers keep serving the stale old state — the
    checkpoint and the state dir must travel together
    (:func:`summary_stream` co-locates them for exactly this
    reason)."""
    if keep_last < 2:
        # enforced HERE, not just on the summary_stream wrapper: this
        # step is directly callable (and reachable via the profile
        # CLI's --state path), and keep_last=1 would vacuum the replay
        # anchor M right after commit — a retried batch N then finds
        # no prior < N and silently rebuilds the summary from that one
        # batch, discarding everything accumulated before it
        raise ValueError(
            "keep_last must be >= 2: a replayed batch reads the "
            "PREVIOUS committed version, and vacuuming it would "
            "silently rebuild the summary from one batch"
        )
    spark = batch_df.sparkSession
    ids = _committed_summary_batches(state_path)
    if ids and batch_id < ids[-1]:
        raise ValueError(
            f"summary state at {state_path} already holds version "
            f"{ids[-1]} but the stream delivered batch {batch_id} — "
            "a restarted checkpoint is replaying old batch ids against "
            "newer state; resume the original checkpoint (it lives "
            "inside the state dir when driven by summary_stream) or "
            "start a fresh state_path"
        )
    batch_state = build_fn(batch_df)
    prior = latest_summary(spark, state_path, before=batch_id)
    merged = batch_state if prior is None else merge_fn(prior, batch_state)
    merged.write.mode("overwrite").parquet(
        os.path.join(state_path, f"batch_id={batch_id}")
    )
    if keep_last >= 1:
        for old in _committed_summary_batches(state_path)[:-keep_last]:
            shutil.rmtree(
                os.path.join(state_path, f"batch_id={old}"),
                ignore_errors=True,
            )


def summary_stream(
    stream: DataFrame,
    state_path: str,
    build_fn,
    merge_fn,
    timeout_s: int = 300,
    keep_last: int = 2,
) -> None:
    """Maintain a standing mergeable summary (`operators/sketch.py`)
    over a stream: each micro-batch is summarized with ``build_fn``
    (batch DataFrame → state table) and folded into the persisted
    state with ``merge_fn`` (prior, batch state → state table) under
    the versioned exactly-once discipline of
    :func:`summary_apply_batch`. This is incremental view maintenance
    for the NON-distributive aggregates streaming aggregation cannot
    express in update mode (distinct counts, frequencies, quantiles):
    per batch it costs O(|batch| + |summary|), and the summary a
    reader sees (:func:`latest_summary`) is always a committed,
    consistent version — never a half-merged one."""
    if keep_last < 2:
        raise ValueError(
            "keep_last must be >= 2 on the streaming path: a replayed "
            "batch reads the PREVIOUS committed version, and vacuuming "
            "it would silently rebuild the summary from one batch"
        )

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        summary_apply_batch(
            state_path, batch_df, batch_id, build_fn, merge_fn,
            keep_last=keep_last,
        )

    # the checkpoint LIVES WITH the state and is never deleted: batch
    # ids are only monotone within one checkpoint lineage, and the
    # whole versioned-state discipline keys on them — a fresh
    # checkpoint per invocation would restart ids at 0 and (but for
    # the stale-id guard) vacuum/overwrite live versions. Co-location
    # also makes re-invocation the natural operation: new source files
    # resume from the same checkpoint with CONTINUING batch ids.
    ckpt = os.path.join(state_path, "_checkpoint")
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"summary_stream did not drain the backlog within "
                f"{timeout_s}s; the checkpoint and state at "
                f"{state_path} are consistent and resumable"
            )
    finally:
        if q.isActive:
            q.stop()


def distinct_summary_stream(
    stream: DataFrame,
    state_path: str,
    keys: list[str],
    cols: list[str],
    lg_k: int = 12,
    timeout_s: int = 300,
    keep_last: int = 2,
) -> None:
    """:func:`summary_stream` specialized to the per-key HLL distinct
    summary: the streaming answer to "how many distinct X per key so
    far" with O(keys · 2^lg_k) state, where exact streaming
    countDistinct state grows with the data itself. Read the current
    estimates with ``hll_estimate(latest_summary(...), cols)``."""
    from yelp_recommender_spark.operators.sketch import hll_merge, hll_state

    summary_stream(
        stream,
        state_path,
        build_fn=lambda b: hll_state(b, keys, cols, lg_k=lg_k),
        merge_fn=lambda prior, batch: hll_merge(prior, batch, keys, cols),
        timeout_s=timeout_s,
        keep_last=keep_last,
    )
