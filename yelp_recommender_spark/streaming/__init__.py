"""Structured Streaming surface (greenfield — the reference has no
streaming code, SURVEY.md §2.11).

The batch operators with streaming-meaningful semantics (windowed
aggregation, dedup, sessionization, top-k) are exposed over
``readStream`` with watermarks. Each streaming op is the *same logical
plan* as its batch twin in :mod:`yelp_recommender_spark.queries.events`;
tests run them with ``trigger(availableNow=True)`` and assert equality
against the batch result — the Dataflow-style "streaming is batch plus
incremental state" contract.
"""

from yelp_recommender_spark.streaming.ops import (
    attribution_join_outer_stream,
    attribution_join_stream,
    dedup_stream,
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    running_totals_stream,
    sessionize_stream,
    sliding_counts_stream,
    top_events_per_window_foreachbatch,
)

__all__ = [
    "read_events_stream",
    "hourly_counts_stream",
    "dedup_stream",
    "sessionize_stream",
    "sliding_counts_stream",
    "running_totals_stream",
    "attribution_join_stream",
    "attribution_join_outer_stream",
    "top_events_per_window_foreachbatch",
    "run_to_memory",
]
