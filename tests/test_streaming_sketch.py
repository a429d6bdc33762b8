"""Streaming standing-summary maintenance (`streaming/ops.py`
`summary_stream` / `distinct_summary_stream`): end-to-end multi-batch
HLL maintenance vs a batch rescan, replay idempotence of the versioned
state for a LINEAR sketch (where a mutable state table would
double-count), the replaying-batch-reads-prior-version rule, and
version vacuuming."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


def _doc_stream_dir(spark, tmp_path, n_files=3):  # noqa: F811
    """documents sf0.001 split into n parquet files so
    maxFilesPerTrigger=1 yields n micro-batches."""
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "docs_stream")
    src.repartition(n_files).write.mode("overwrite").parquet(d)
    return d


def test_distinct_summary_stream_matches_batch_rescan(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        hll_estimate,
        hll_state,
    )
    from yelp_recommender_spark.schemas import TESTDATA_SCHEMAS
    from yelp_recommender_spark.streaming.ops import (
        _committed_summary_batches,
        distinct_summary_stream,
        latest_summary,
    )

    d = _doc_stream_dir(spark, tmp_path)
    stream = (
        spark.readStream.schema(TESTDATA_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    state = str(tmp_path / "state")
    distinct_summary_stream(
        stream.select("source", "doc_id"), state, ["source"], ["doc_id"]
    )
    assert len(_committed_summary_batches(state)) >= 1
    got = {
        r.source: r.dv_doc_id
        for r in hll_estimate(
            latest_summary(spark, state), ["doc_id"]
        ).collect()
    }
    whole = spark.read.parquet(d).select("source", "doc_id")
    exact = {
        r.source: r.dv
        for r in whole.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("dv"))
        .collect()
    }
    assert set(got) == set(exact)
    for s in exact:  # lg_k=12: ~1.6% one-sigma; docs per source is small
        assert abs(got[s] - exact[s]) / exact[s] < 0.05


def _cms_fns():
    from yelp_recommender_spark.operators.sketch import cms_merge, cms_state

    return (
        lambda b: cms_state(b, "item", depth=3, width=128),
        cms_merge,
    )


def _rows(df):
    return sorted((r.d, r.pos, r.n) for r in df.collect())


def test_replay_of_linear_sketch_batch_is_exactly_once(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.streaming.ops import (
        latest_summary,
        summary_apply_batch,
    )

    build_fn, merge_fn = _cms_fns()
    state = str(tmp_path / "cms_state")
    b0 = spark.range(100).select(F.concat(F.lit("a"), "id").alias("item"))
    b1 = spark.range(50).select(F.concat(F.lit("b"), "id").alias("item"))

    summary_apply_batch(state, b0, 0, build_fn, merge_fn)
    summary_apply_batch(state, b1, 1, build_fn, merge_fn)
    after_once = _rows(latest_summary(spark, state))

    # a failure re-delivers batch 1 with the SAME batch_id: the replay
    # must read version 0 (never its own output) and converge — a
    # mutable single-table state would add batch 1's counts twice here
    summary_apply_batch(state, b1, 1, build_fn, merge_fn)
    assert _rows(latest_summary(spark, state)) == after_once

    # and the counts are the true fold of both batches
    whole = build_fn(b0.unionByName(b1))
    assert _rows(latest_summary(spark, state)) == _rows(whole)


def test_versions_are_vacuumed_but_replay_anchor_kept(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.streaming.ops import (
        _committed_summary_batches,
        summary_apply_batch,
    )

    build_fn, merge_fn = _cms_fns()
    state = str(tmp_path / "gc_state")
    for i in range(5):
        b = spark.range(10 * (i + 1)).select(
            F.col("id").cast("string").alias("item")
        )
        summary_apply_batch(state, b, i, build_fn, merge_fn, keep_last=2)
    # only the newest two versions remain: the current one + the prior
    # a replay of the current batch would need
    assert _committed_summary_batches(state) == [3, 4]


def test_summary_stream_rejects_anchorless_retention(spark, tmp_path):  # noqa: F811
    import pytest

    from yelp_recommender_spark.schemas import TESTDATA_SCHEMAS
    from yelp_recommender_spark.streaming.ops import summary_stream

    d = _doc_stream_dir(spark, tmp_path, n_files=1)
    stream = (
        spark.readStream.schema(TESTDATA_SCHEMAS["documents"]).parquet(d)
    )
    build_fn, merge_fn = _cms_fns()
    with pytest.raises(ValueError, match="keep_last"):
        summary_stream(
            stream, str(tmp_path / "s"), build_fn, merge_fn, keep_last=1
        )


def test_summary_stream_resumes_across_invocations(spark, tmp_path):  # noqa: F811
    """The cross-run lifecycle: a SECOND summary_stream invocation on
    the same state_path must CONTINUE the batch-id lineage (checkpoint
    co-located with the state), not restart at 0 and vacuum/overwrite
    live versions — the failure mode the stale-id guard exists for."""
    from yelp_recommender_spark.operators.sketch import (
        hll_estimate,
    )
    from yelp_recommender_spark.schemas import TESTDATA_SCHEMAS
    from yelp_recommender_spark.streaming.ops import (
        _committed_summary_batches,
        distinct_summary_stream,
        latest_summary,
    )

    src = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("source", "doc_id")
    half1 = src.where(F.col("doc_id") % 2 == 0)
    half2 = src.where(F.col("doc_id") % 2 == 1)
    d = str(tmp_path / "stream_src")
    half1.repartition(2).write.mode("overwrite").parquet(d)

    def run():
        stream = (
            spark.readStream.schema("source string, doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        distinct_summary_stream(stream, state, ["source"], ["doc_id"])

    state = str(tmp_path / "state")
    run()
    ids_run1 = _committed_summary_batches(state)
    # append the second half as NEW files and re-invoke: the co-located
    # checkpoint resumes, so batch ids continue past run 1's
    half2.repartition(2).write.mode("append").parquet(d)
    run()
    ids_run2 = _committed_summary_batches(state)
    assert ids_run2[-1] > ids_run1[-1]

    got = {
        r.source: r.dv_doc_id
        for r in hll_estimate(
            latest_summary(spark, state), ["doc_id"]
        ).collect()
    }
    exact = {
        r.source: r.dv
        for r in src.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("dv"))
        .collect()
    }
    assert set(got) == set(exact)
    for s in exact:
        assert abs(got[s] - exact[s]) / exact[s] < 0.05
    # schemas import used only for parity with the sibling test
    assert "documents" in TESTDATA_SCHEMAS


def test_stale_batch_id_is_rejected_loudly(spark, tmp_path):  # noqa: F811
    import pytest

    from yelp_recommender_spark.streaming.ops import summary_apply_batch

    build_fn, merge_fn = _cms_fns()
    state = str(tmp_path / "stale_state")
    for i in range(3):
        b = spark.range(10).select(F.col("id").cast("string").alias("item"))
        summary_apply_batch(state, b, i, build_fn, merge_fn)
    # a fresh checkpoint would re-deliver batch 0 against version-2
    # state: folding it in would vacuum/overwrite live versions — the
    # guard turns silent corruption into a loud error
    with pytest.raises(ValueError, match="restarted checkpoint"):
        summary_apply_batch(
            state,
            spark.range(5).select(F.col("id").cast("string").alias("item")),
            0,
            build_fn,
            merge_fn,
        )
