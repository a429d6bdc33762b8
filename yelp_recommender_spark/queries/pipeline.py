"""Catalog entries for the streaming + multimodal pipeline surfaces
(SURVEY.md §2.11), each run as an ACTUAL Structured Streaming query (or
Arrow decode pipeline) and — wherever the emission set is relationally
definable — gated by a full DuckDB oracle that models the watermark
frontier itself (the q116 pattern, generalized in round 5):

- The testdata backlog is one parquet file and ``maxFilesPerTrigger=1``,
  so the whole stream lands in a single micro-batch; availableNow then
  runs a final no-data batch whose watermark is ``max(event_ts) − delay``
  (Spark tracks event-time stats in MILLISECONDS, so the max is
  ms-truncated before the delay subtracts — the oracles reproduce that
  with ``(MAX(us) // 1000) * 1000``). Append-mode emission is exactly
  the batch aggregate restricted to windows/sessions closed by that
  final frontier — a pure relational predicate.
- q60 stays rows-only: its output is the fake codec's per-image feature
  vector itself (byte-level sha256 stream math); the Arrow batch shape
  and feature values are pinned by ``tests/test_multimodal.py``. q64, in
  contrast, reduces the codec output to the planted-duplicate pair set —
  a deterministic relation the oracle states literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yelp_recommender_spark.queries.registry import query


@query(
    "q59_streaming_hourly_counts",
    oracle="""
    WITH ev AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
    wm AS (SELECT (MAX(us) // 1000) * 1000 - 7200000000 AS frontier FROM ev),
    w AS (SELECT (us // 3600000000) * 3600000000 AS window_start_us,
                 event_type,
                 COUNT(*) AS n_events,
                 ROUND(SUM(value), 6) AS total_value
          FROM ev GROUP BY 1, 2)
    SELECT window_start_us, event_type, n_events, total_value
    FROM w, wm WHERE window_start_us + 3600000000 <= frontier
    """,
)
def q59_streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts over the events backlog run as
    an actual Structured Streaming query (``trigger(availableNow=True)``,
    append mode) — the streaming twin of q16. Emits every window closed
    by the final watermark (max event time − 2 h); the last few open
    windows stay in state, exactly as they would on a live stream.

    FULL oracle (was rows-only through r4): the emitted set is the batch
    hourly aggregate restricted to ``window_end <= final watermark``, and
    the single-file backlog makes that frontier a relational expression —
    ms-truncated max event time minus the 2 h delay (module docstring).
    Window starts surface as epoch-µs longs (timezone-representation-free
    on both engines); the order-dependent double sum rounds at 6 on both
    sides per the registry's float policy."""
    from yelp_recommender_spark.streaming.ops import (
        hourly_counts_stream,
        read_events_stream,
        run_to_memory,
        sized_state_partitions,
    )

    stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
    out = run_to_memory(
        stream, "q59_hourly", output_mode="append",
        state_partitions=sized_state_partitions(spark, sf_dir),
    )
    # stable ordering-independent output (the driver sorts by columns)
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n_events",
        F.round("total_value", 6).alias("total_value"),
    )


@query(
    "q61_streaming_sessions",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    wm AS (SELECT (MAX(us) // 1000) * 1000 - 7200000000 AS frontier FROM ev),
    o AS (SELECT user_id, us,
                 CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                           IS NULL
                       OR us - LAG(us) OVER (PARTITION BY user_id
                                             ORDER BY us) >= 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM ev),
    g AS (SELECT user_id, us,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM o),
    s AS (SELECT user_id,
                 MIN(us) AS session_start_us,
                 MAX(us) + 1800000000 AS session_end_us,
                 COUNT(*) AS n_events
          FROM g GROUP BY user_id, sid)
    SELECT user_id, session_start_us, session_end_us, n_events
    FROM s, wm WHERE session_end_us <= frontier
    """,
)
def q61_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (``session_window``, 30-min
    gap) run as a real streaming query — gates the STATEFUL merging
    window op, not just tumbling counts (VERDICT r3 #8). Append mode
    emits each session once it can no longer grow (watermark passes its
    end = last event + gap).

    FULL oracle (was rows-only through r4): session merging is the
    classic gap-and-island — a new island starts when the gap to the
    previous event is ≥ 30 min (``session_window`` merges an event that
    lands strictly inside the previous event + gap), session end = last
    event + gap, and the emitted set is the islands whose end ≤ the
    final ms-truncated watermark frontier (module docstring). Bounds
    surface as epoch-µs longs."""
    from yelp_recommender_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        sized_state_partitions,
        sessionize_stream,
    )

    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    out = run_to_memory(
        stream, "q61_sessions", output_mode="append",
        state_partitions=sized_state_partitions(spark, sf_dir),
    )
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


@query(
    "q62_streaming_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q62_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via ``dropDuplicatesWithinWatermark`` — one
    row per (user_id, event_type) seen within the watermark horizon.
    Only the dedup KEY columns are returned: which physical row the
    state store keeps (its ts/value payload) is an arrival-order detail,
    but the emitted key set is deterministic for a fixed backlog.

    FULL oracle (was rows-only through r4): dedup emission is NOT held
    back by the watermark (the watermark only bounds state retention —
    re-emission could occur only for key recurrences farther apart than
    the horizon ACROSS micro-batches), and the single-file backlog is one
    micro-batch, so the emitted set is exactly the distinct key set."""
    from yelp_recommender_spark.streaming.ops import (
        dedup_stream,
        read_events_stream,
        run_to_memory,
        sized_state_partitions,
    )

    stream = dedup_stream(read_events_stream(spark, sf_dir)).select(
        "user_id", "event_type"
    )
    out = run_to_memory(
        stream, "q62_dedup", output_mode="append",
        state_partitions=sized_state_partitions(spark, sf_dir),
    )
    return out.select("user_id", "event_type")


@query(
    "q63_streaming_running_totals",
    oracle="""
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q63_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-(user, event_type) running count/sum emitted as a changelog in
    update mode. Over the bounded backlog the final emission per key
    equals the batch aggregate.

    FULL oracle (was rows-only through r4): the changelog emission set is
    defined by the micro-batch sequence — and the single-file backlog IS
    one micro-batch, so the changelog holds exactly one row per key: the
    final state, i.e. the plain batch group-by the oracle states. The
    order-dependent double sum rounds at 6 on both sides."""
    from yelp_recommender_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        running_totals_stream,
    )

    stream = running_totals_stream(read_events_stream(spark, sf_dir))
    # deliberately NOT backlog-sized (sized_state_partitions): this op's
    # per-batch cost is the Python state kernel, which wants parallelism
    # — the r10 interleaved A/B measured 2 state partitions ~2× SLOWER
    # than the min(parallelism, 8) default on the same backlog
    out = run_to_memory(stream, "q63_totals", output_mode="update")
    # one file = one micro-batch here, so the changelog has exactly one
    # row per key; round for cross-run float stability
    return out.select(
        "user_id",
        "event_type",
        "n_events",
        F.round("total_value", 6).alias("total_value"),
    )


@query(
    "q72_streaming_attribution_join",
    oracle="""
    WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS us
               FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id, epoch_us(ts) AS us
          FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
           t.event_id AS trigger_event_id,
           c.event_id AS convert_event_id,
           t.us AS trigger_us,
           c.us AS convert_us,
           CAST(c.us - t.us AS DOUBLE) / 1000000.0 AS lag_seconds
    FROM c JOIN t
      ON c.user_id = t.user_id
     AND t.us <= c.us
     AND t.us >= c.us - 3600000000::BIGINT
    """,
)
def q72_streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join run as a real Structured Streaming
    query: every purchase paired with the same user's views in the
    preceding hour (:func:`~yelp_recommender_spark.streaming.ops.attribution_join_stream`).

    Unlike the windowed entries (q59/q61), this one IS fully
    oracle-checkable: an INNER stream-stream join emits a pair when both
    rows have arrived — not when the watermark closes — and the testdata
    backlog is a single file, so the whole stream lands in one micro-batch
    and no buffered row can be evicted before its match arrives. The
    emission set is therefore exactly the batch join with the same
    time-range predicate. (On a multi-file backlog, rows later than the
    watermark horizon behind the frontier COULD be dropped — that is the
    state bound working as designed; the single-batch case gates the join
    semantics, the operator docstring records the eviction contract.)

    Event times are surfaced as epoch-µs longs (not TIMESTAMP) so the
    comparison is timezone-representation-free on both engines."""
    from yelp_recommender_spark.streaming.ops import (
        attribution_join_stream,
        read_events_stream,
        run_to_memory,
        sized_state_partitions,
    )

    stream = attribution_join_stream(
        read_events_stream(spark, sf_dir),
        trigger_type="view",
        convert_type="purchase",
        horizon="1 hour",
    )
    out = run_to_memory(
        stream, "q72_attr", output_mode="append",
        state_partitions=sized_state_partitions(spark, sf_dir),
    )
    return out.select(
        "user_id",
        "trigger_event_id",
        "convert_event_id",
        F.unix_micros("trigger_ts").alias("trigger_us"),
        F.unix_micros("convert_ts").alias("convert_us"),
        "lag_seconds",
    )


@query(
    "q116_streaming_attribution_outer",
    oracle="""
    WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS us
               FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id, epoch_us(ts) AS us
          FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT LEAST((SELECT MAX(us) FROM t), (SELECT MAX(us) FROM c))
                  - 7200000000 AS frontier),
    lj AS (
        SELECT c.user_id,
               c.event_id AS convert_event_id,
               c.us AS convert_us,
               t.event_id AS trigger_event_id,
               t.us AS trigger_us
        FROM c LEFT JOIN t
          ON c.user_id = t.user_id
         AND t.us <= c.us
         AND t.us >= c.us - 3600000000::BIGINT
    )
    SELECT * FROM lj WHERE trigger_event_id IS NOT NULL
    UNION ALL
    SELECT lj.* FROM lj, wm
    WHERE trigger_event_id IS NULL AND convert_us < frontier
    """,
)
def q116_streaming_attribution_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join run as a real streaming
    query (:func:`~yelp_recommender_spark.streaming.ops.attribution_join_outer_stream`):
    q72 plus visibility of UNCONVERTED purchases — and, unlike q72, the
    oracle must model the WATERMARK ITSELF. A null-match row may only
    emit once the watermark proves no qualifying view can still arrive,
    so the emitted set is: all matched pairs, plus the batch left-join
    nulls whose convert time lies strictly before the final watermark
    (min of both sides' max event time, minus the 2-hour delay). The
    younger nulls are correctly ABSENT — the stream hasn't proven their
    non-match yet. Gating that frontier in SQL pins Spark's outer-join
    state-eviction semantics, not just the join predicate.

    Event times surface as epoch-µs longs, timezone-representation-free
    on both engines."""
    from yelp_recommender_spark.streaming.ops import (
        attribution_join_outer_stream,
        read_events_stream,
        run_to_memory,
        sized_state_partitions,
    )

    stream = attribution_join_outer_stream(
        read_events_stream(spark, sf_dir),
        trigger_type="view",
        convert_type="purchase",
        horizon="1 hour",
        watermark="2 hours",
    )
    out = run_to_memory(
        stream, "q116_attr_outer", output_mode="append",
        state_partitions=sized_state_partitions(spark, sf_dir),
    )
    return out.select(
        "user_id",
        "convert_event_id",
        F.unix_micros("convert_ts").alias("convert_us"),
        "trigger_event_id",
        F.unix_micros("trigger_ts").alias("trigger_us"),
    )


@query(
    "q79_stream_static_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment,
           round(e.value, 6) AS value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q79_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join run as a real Structured Streaming
    query: each event enriched with its user's market segment from the
    static customer dimension
    (:func:`~yelp_recommender_spark.streaming.ops.enrich_stream`).

    Fully oracle-checkable: a stream-static INNER join holds no stream
    state and emits exactly the batch join of the backlog — the oracle
    states that join directly. value rounds to 6 (pass-through double)."""
    from yelp_recommender_spark.sources.tables import load_tables
    from yelp_recommender_spark.streaming.ops import (
        enrich_stream,
        read_events_stream,
        run_to_memory,
        sized_state_partitions,
    )

    dim = load_tables(spark, sf_dir, ["customer"])["customer"].select(
        "c_custkey", "c_mktsegment"
    )
    stream = enrich_stream(read_events_stream(spark, sf_dir), dim).select(
        "event_id",
        "user_id",
        "c_mktsegment",
        F.round("value", 6).alias("value"),
    )
    out = run_to_memory(
        stream, "q79_enrich", output_mode="append",
        state_partitions=sized_state_partitions(spark, sf_dir),
    )
    return out.select("event_id", "user_id", "c_mktsegment", "value")


@query(
    "q64_multimodal_neardup",
    oracle="""
    SELECT CAST(i AS BIGINT) AS id1,
           CAST(i + 1000 AS BIGINT) AS id2,
           CAST(1.0 AS DOUBLE) AS cos
    FROM range(8) t(i)
    """,
)
def q64_multimodal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end modality composition — the shape a curation pipeline
    actually runs: image payloads (with planted byte-identical
    duplicates) → Arrow-batched feature extraction (q60's transform) →
    per-dimension mean-centering → embedding near-dup pairs through the
    cardinality-based similarity planner (q34's operator).

    Centering is load-bearing, not cosmetic: low-variance features
    (every image's channel means sit near 127.5/255) make RAW cosine ≈ 1
    for everything; subtracting the per-dimension corpus mean leaves the
    deviations, where only true duplicates stay at cosine 1 — the
    standard standardize-before-cosine move. The planted (i, i+1000)
    duplicate pairs are exactly what must survive; deterministic, pinned
    by tests/test_multimodal.py.

    FULL oracle (was rows-only through r4): the emitted relation is
    derivable without replaying the codec — byte-identical payloads give
    byte-identical feature vectors, so each planted pair scores cosine
    exactly 1.0 (survives the 6-digit round), and no distinct images may
    cross the 0.99 threshold after centering. The oracle states that
    relation literally: the 8 planted pairs at cos 1.0. A false negative
    (a lost planted pair) OR a false positive (a spurious near-dup, i.e.
    broken centering) breaks the hash — this pins the whole decode →
    center → planner → matmul chain, not a constant."""
    from yelp_recommender_spark.cache import register_persist
    from yelp_recommender_spark.multimodal import (
        extract_image_features,
        synthesize_media,
    )
    from yelp_recommender_spark.operators.ann import cosine_pairs_above_auto

    media = synthesize_media(spark, n=64, kind="image")
    dups = media.filter(F.col("media_id") < 8).withColumn(
        "media_id", F.col("media_id") + 1000
    )
    # persisted (session registry): the feature table feeds the mean
    # aggregate, the centering join, the planner's cardinality probe,
    # and the ANN index collect — without the cache the Arrow decode
    # pipeline re-runs once per consumer
    feats = register_persist(
        extract_image_features(media.unionByName(dups), n_bins=8).select(
            F.col("media_id").alias("vec_id"),
            F.posexplode("features").alias("dim_idx", "v"),
        )
    )
    mu = feats.groupBy("dim_idx").agg(F.avg("v").alias("mu"))
    # pinned like feats: the all-pairs planner consumes centered three
    # times (cardinality count, index collect, query-side scan), and
    # each raw reference re-ran the centering join + per-image
    # collect_list over the cached features
    centered = register_persist(
        feats.join(F.broadcast(mu), "dim_idx")
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim_idx", (F.col("v") - F.col("mu")).alias("c")))
                ),
                lambda s: s["c"],
            ).alias("embedding")
        )
    )
    return cosine_pairs_above_auto(centered, threshold=0.99).orderBy(
        "id1", "id2"
    )


def _q60_oracle() -> str:
    """Independent pure-Python replay of the q60 chain (payload synth →
    fake decode → channel means + 8-bin histogram → feature mean),
    emitted as a literal VALUES table. The replay shares only numpy/
    hashlib with the engine — none of the Spark/Arrow/mapInPandas
    machinery the query gates — and the fold order matches Spark's
    ``F.aggregate`` left fold exactly (plain in-order sum from 0.0), so
    the rounded values are bit-identical."""
    import hashlib

    import numpy as np

    rows = []
    for i in range(64):
        w, h, c = 16 + (i % 4) * 8, 16 + (i % 3) * 8, 3
        need = w * h * c
        out = bytearray()
        counter = 0
        while len(out) < need:
            out.extend(
                hashlib.sha256(f"{i}:{counter}".encode()).digest()
            )
            counter += 1
        img = np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(
            h, w, c
        )
        means = img.reshape(-1, c).mean(axis=0) / 255.0
        hist = np.bincount(
            (img.ravel().astype(np.int64) * 8) // 256, minlength=8
        ).astype(np.float64)
        hist = hist / hist.sum()
        feats = np.concatenate([means, hist]).tolist()
        acc = 0.0
        for x in feats:  # F.aggregate's left fold, same order
            acc += x
        rows.append(f"({i}, {len(feats)}, {acc / len(feats)!r})")
    values = ",\n           ".join(rows)
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(n_features AS INT) AS n_features,
           round(CAST(mean_raw AS DOUBLE), 6) AS mean_feature
    FROM (VALUES {values}) AS t(media_id, n_features, mean_raw)
    """


@query("q60_multimodal_image_features", oracle=_q60_oracle())
def q60_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: a deterministic 64-image media
    table (binary payload + typed meta struct) → Arrow-batched
    ``mapInPandas`` decode + feature extraction (channel means + 8-bin
    histogram) → per-image feature summary. Map-only; payloads never
    cross a shuffle (they are projected away before the final select).

    FULL oracle (was rows-only through r4): the codec is deterministic
    byte math, so the whole chain replays in pure Python at oracle-build
    time (:func:`_q60_oracle`) — the oracle pins every per-image value
    the Spark/Arrow pipeline produces, independent of that pipeline."""
    from yelp_recommender_spark.multimodal import (
        extract_image_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n=64, kind="image")
    feats = extract_image_features(media, n_bins=8)
    return feats.select(
        "media_id",
        F.size("features").alias("n_features"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x)
            / F.size("features"),
            6,
        ).alias("mean_feature"),
    )


def _q89_oracle() -> str:
    from yelp_recommender_spark.queries.dedup import (
        DUCK_BANDS8,
        DUCK_MINHASH16,
        DUCK_SHINGLES3,
        DUCK_TOKS,
    )

    return f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    shs AS (SELECT doc_id, {DUCK_SHINGLES3} AS sh FROM t WHERE len(toks) >= 3),
    sigs AS (SELECT doc_id, sh, {DUCK_MINHASH16} AS sig FROM shs),
    bands AS (SELECT doc_id, unnest({DUCK_BANDS8}) AS bk FROM sigs),
    bb AS (SELECT * FROM bands WHERE doc_id % 10 >= 8),
    partners AS (
        SELECT doc_id, bk, TRUE AS corp FROM bands WHERE doc_id % 10 < 8
        UNION ALL
        SELECT doc_id, bk, FALSE FROM bb
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, p.doc_id AS d2
        FROM bb a JOIN partners p
          ON a.bk = p.bk AND (p.corp OR p.doc_id < a.doc_id)
    ),
    verified AS (
        SELECT DISTINCT d1
        FROM cand
        JOIN shs x ON d1 = x.doc_id
        JOIN shs y ON d2 = y.doc_id
        WHERE len(list_intersect(x.sh, y.sh))
              / (len(x.sh) + len(y.sh)
                 - len(list_intersect(x.sh, y.sh))) >= 0.8
    ),
    s AS (SELECT COUNT(*) AS n_stream FROM documents WHERE doc_id % 10 >= 8),
    d AS (SELECT COUNT(*) AS n_rejected FROM verified)
    SELECT s.n_stream,
           s.n_stream - d.n_rejected AS n_novel,
           d.n_rejected
    FROM s, d
    """


@query("q89_streaming_incremental_dedup", oracle=_q89_oracle())
def q89_streaming_incremental_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming ingest dedup run as an actual Structured Streaming
    query: the held-out documents (doc_id % 10 ≥ 8) arrive as a file
    stream and each micro-batch is MinHash-matched against the static
    corpus index (doc_id % 10 < 8) in a foreachBatch sink; only novel
    docs are appended to the output. Output: one row
    (n_stream, n_novel, n_rejected).

    FULL oracle (was rows-only through r4): the single-file backlog is
    one micro-batch, so the rejected set is exactly q70's operator over
    the same batch/corpus split — the oracle replays that CTE chain and
    counts it. The catalog entry runs the PORTABLE md5 MinHash family
    (``fast=False``) so candidate generation is hash-for-hash
    reproducible in DuckDB; the default xxhash64 fast path differs only
    in which near-threshold pairs the LSH surfaces (q70's probabilistic
    candidate story) and stays the production default, parity-pinned by
    ``tests/test_streaming.py``.

    Scale: the corpus index is the persisted shingle/signature table
    (computed once, reused across cycles); per micro-batch the join is
    batch × indexed band keys — never corpus × corpus, no broadcast of
    the corpus."""
    import os
    import tempfile
    import uuid

    from yelp_recommender_spark.queries.dedup import _doc_shingles
    from yelp_recommender_spark.streaming.ops import (
        incremental_dedup_stream,
        read_docs_stream,
    )

    corpus = _doc_shingles(spark, sf_dir).filter(F.col("doc_id") % 10 < 8)
    stream = read_docs_stream(spark, sf_dir).filter(
        F.col("doc_id") % 10 >= 8
    )
    out_path = os.path.join(
        tempfile.gettempdir(), f"q89_novel_{uuid.uuid4().hex[:8]}"
    )
    incremental_dedup_stream(stream, corpus, out_path, fast=False)
    novel = spark.read.parquet(out_path)
    n_stream_df = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).filter(F.col("doc_id") % 10 >= 8)
    return (
        n_stream_df.agg(F.count(F.lit(1)).alias("n_stream"))
        .crossJoin(novel.agg(F.count(F.lit(1)).alias("n_novel")))
        .select(
            "n_stream",
            "n_novel",
            (F.col("n_stream") - F.col("n_novel")).alias("n_rejected"),
        )
    )
