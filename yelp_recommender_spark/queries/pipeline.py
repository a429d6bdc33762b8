"""Catalog entries for the non-SQL-expressible pipeline surfaces
(SURVEY.md §2.11 streaming + the multimodal binary-column plumbing), so
the driver's correctness gate exercises them every round instead of
pytest alone. Both are rows-only by design:

- q59: Structured Streaming's append-mode emission set depends on the
  watermark frontier after the final micro-batch — deterministic for a
  fixed backlog, but defined by the streaming state machine, not by a
  relational expression a SQL oracle could state. The batch-parity
  *values* are pinned by ``tests/test_streaming.py``.
- q60: the deterministic fake codec is byte-level (sha256 stream) — not
  SQL-expressible; the Arrow batch shape and feature contract are pinned
  by ``tests/test_multimodal.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yelp_recommender_spark.queries.registry import query


@query("q59_streaming_hourly_counts")  # rows-only: append-mode frontier
def q59_streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts over the events backlog run as
    an actual Structured Streaming query (``trigger(availableNow=True)``,
    append mode) — the streaming twin of q16. Emits every window closed
    by the final watermark (max event time − 2 h); the last few open
    windows stay in state, exactly as they would on a live stream."""
    from yelp_recommender_spark.streaming.ops import (
        hourly_counts_stream,
        read_events_stream,
        run_to_memory,
    )

    stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
    out = run_to_memory(stream, "q59_hourly", output_mode="append")
    # stable ordering-independent output (the driver sorts by columns)
    return out.select("window_start", "event_type", "n_events", "total_value")


@query("q60_multimodal_image_features")  # rows-only: byte-level fake codec
def q60_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: a deterministic 64-image media
    table (binary payload + typed meta struct) → Arrow-batched
    ``mapInPandas`` decode + feature extraction (channel means + 8-bin
    histogram) → per-image feature summary. Map-only; payloads never
    cross a shuffle (they are projected away before the final select)."""
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
