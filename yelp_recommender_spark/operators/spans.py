"""Cross-document repeated-substring spans: find and strip token spans
that recur across the corpus — the scalable approximation of
exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499 §4.1).

The ExactSubstr method finds every ≥50-token substring occurring twice
in the corpus via a suffix array — an inherently single-machine,
memory-resident structure. The distributed re-expression: hash every
w-token sliding window, keep the window hashes that recur (across
``min_docs`` distinct documents, or ``min_count`` total occurrences),
and merge each document's hit windows into maximal spans. Any repeated
substring of length ≥ w is covered by at least one repeated window, so
the merged spans are a SUPERSET of the ≥w exact-substring matches
(windows overlapping a repeat's boundary extend a span by < w tokens on
each side — bounded slack, conservative direction for dedup). The only
false-positive source is a 64-bit hash collision (~n²/2⁶⁴ over the
distinct-window count — at 10¹² windows, ~0.03 expected collisions).

Scale shape:
- Window hashing is MAP-ONLY column algebra (per-row `transform` over
  the token array; no explode until the hash join needs rows).
- The recurrence count is one hash-agg on uniform 64-bit keys (partial
  aggregation upstream; no skewed key can exist — the key IS a hash).
- Hits join back on the same uniform key; the fan-out equals the true
  hit count, which is the output's size — inherent, not a plan defect.
- Span merging is the islands pattern: one window over (doc, start) —
  state per doc is a running max, never a collected list.
- Removal is per-row array algebra (`filter` with the positional
  lambda) against each doc's own span list — map-only after one
  doc-keyed join.

No reference counterpart — part of the engine's LLM-data-pipeline
family (BASELINE "LLM-data-pipeline operators"); complements
`q73_doc_repetition` (within-doc rates) and the whole-doc dedup family
(near-dup docs) by catching PARTIAL overlap: boilerplate, licence
blocks, syndicated passages embedded in otherwise-unique documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["window_hashes", "repeated_window_spans", "remove_spans"]

# ASCII unit separator: joins window tokens for hashing. A token
# containing the separator could alias a neighbor split differently;
# tokenizers upstream strip control chars, and an alias only ever ADDS
# a (w-bounded) span — the conservative direction.
_SEP = "\x1f"


def window_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    w: int = 8,
) -> DataFrame:
    """(id, start, whash) — xxhash64 of every w-token sliding window,
    one output row per window position (0-based ``start``). Docs
    shorter than ``w`` tokens contribute nothing. The hash array is
    built map-side with per-row column algebra; the explode feeds the
    recurrence join."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    toks = F.col(tokens_col)
    hashes = F.when(
        F.size(toks) >= w,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - w),
            lambda i: F.xxhash64(
                F.concat_ws(_SEP, F.slice(toks, i + 1, w))
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return docs.select(
        id_col, F.posexplode(hashes).alias("start", "whash")
    )


def repeated_window_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    w: int = 8,
    min_docs: int = 2,
    scope: str = "docs",
) -> DataFrame:
    """(id, span_start, span_end, n_windows) — maximal merged spans of
    window positions whose hash recurs. ``span_end`` is EXCLUSIVE in
    token positions (a single hit window yields span_end - span_start
    = w). ``scope="docs"`` counts distinct documents per window hash
    (cross-document boilerplate; a within-doc repeat alone does not
    trigger); ``scope="occurrences"`` counts total occurrences, so a
    passage pasted twice into ONE document triggers too (the Lee et
    al. criterion). ``min_docs`` is the threshold for either count.

    ``n_windows`` is the number of hit windows merged into the span —
    equal to span_end - span_start - w + 1 when every window position
    inside the span is itself a hit, SMALLER when overlapping hits
    bridge interior non-hit positions (e.g. hits at 0 and 4 with w=8
    merge to one 12-token span of 2 windows), larger impossible."""
    if scope not in ("docs", "occurrences"):
        raise ValueError(
            f"scope must be 'docs' or 'occurrences', got {scope!r}"
        )
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    from yelp_recommender_spark.cache import register_persist

    # persisted boundary: the window table feeds BOTH the recurrence
    # aggregate and the hit join — without it the map-side
    # hash-every-window transform (the operator's most expensive
    # phase) runs twice per call (released by clear_caches() at the
    # pipeline boundary, the engine-wide hygiene convention)
    wh = register_persist(window_hashes(docs, id_col, tokens_col, w))
    cnt = (
        F.countDistinct(id_col)
        if scope == "docs"
        else F.count(F.lit(1))
    )
    repeated = (
        wh.groupBy("whash")
        .agg(cnt.alias("_n"))
        .filter(F.col("_n") >= min_docs)
        .select("whash")
    )
    hits = wh.join(repeated, "whash").select(id_col, "start")
    # islands: a window starts a new span when it begins past the
    # running max end of everything before it
    by_pos = Window.partitionBy(id_col).orderBy("start")
    prev_max_end = F.max(F.col("start") + w).over(
        by_pos.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (F.col("start") > prev_max_end),
            1,
        ).otherwise(0),
    ).withColumn("_island", F.sum("_new").over(by_pos))
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + w).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_island")
    )


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    out_col: str = "toks_clean",
) -> DataFrame:
    """``docs`` with ``out_col`` added: the token array minus every
    position covered by one of the doc's spans ([span_start, span_end)
    token offsets, as :func:`repeated_window_spans` emits). Docs with
    no spans pass through unchanged (left join). The filter is per-row
    array algebra — O(len(doc) · spans(doc)) inside codegen, no
    Python."""
    packed = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"),
                F.col("span_end").alias("e"),
            )
        ).alias("_spans")
    )
    joined = docs.join(packed, id_col, "left")
    cleaned = F.when(
        F.col("_spans").isNull(), F.col(tokens_col)
    ).otherwise(
        F.filter(
            F.col(tokens_col),
            lambda tok, i: ~F.exists(
                "_spans", lambda sp: (i >= sp["s"]) & (i < sp["e"])
            ),
        )
    )
    return joined.withColumn(out_col, cleaned).drop("_spans")
