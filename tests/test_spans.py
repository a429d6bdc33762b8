"""Gates for `operators/spans.py` — cross-document repeated-substring
span detection and removal.

Pins: exact span boundaries on a planted shared passage, the merge
semantics (gap vs overlap), the docs-vs-occurrences scope split, the
min_docs threshold, removal correctness incl. untouched docs, short-doc
and argument edges, partition-layout invariance, and the plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_recommender_spark.operators.spans import (
    remove_spans,
    repeated_window_spans,
    window_hashes,
)

W = 5
PASSAGE = [f"p{i}" for i in range(12)]  # 12 shared tokens


def _uniq(doc, n, tag=""):
    return [f"u{tag}{doc}_{i}" for i in range(n)]


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, toks array<string>")


@pytest.fixture(scope="module")
def planted(spark):
    """Docs 1-3 share PASSAGE at offsets 3/0/7; doc 4 is all-unique."""
    return _docs_df(
        spark,
        [
            (1, _uniq(1, 3) + PASSAGE + _uniq(1, 4, "b")),
            (2, PASSAGE + _uniq(2, 6)),
            (3, _uniq(3, 7) + PASSAGE),
            (4, _uniq(4, 20)),
        ],
    )


def test_planted_passage_exact_boundaries(spark, planted):
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in repeated_window_spans(planted, w=W).collect()
    }
    # 12-token passage, w=5: hit windows at offsets o..o+7, merged span
    # [o, o+12), 8 contiguous windows
    assert out == {1: (3, 15, 8), 2: (0, 12, 8), 3: (7, 19, 8)}


def test_min_docs_threshold(spark, planted):
    assert repeated_window_spans(planted, w=W, min_docs=3).count() == 3
    assert repeated_window_spans(planted, w=W, min_docs=4).count() == 0


def test_gap_splits_overlap_merges(spark):
    """Two shared passages with a > w unique gap stay two spans; with a
    zero gap they merge into one."""
    a = [f"a{i}" for i in range(6)]
    b = [f"b{i}" for i in range(6)]
    gap = _docs_df(
        spark,
        [
            (1, a + _uniq(1, 8) + b),
            (2, a + _uniq(2, 9) + b),
        ],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_window_spans(gap, w=W).collect()
    }
    assert spans == {
        (1, 0, 6), (1, 14, 20),
        (2, 0, 6), (2, 15, 21),
    }
    merged = _docs_df(spark, [(1, a + b), (2, a + b + _uniq(2, 3))])
    out = repeated_window_spans(merged, w=W).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"]) for r in out} == {
        (1, 0, 12), (2, 0, 12)
    }


def test_scope_occurrences_catches_within_doc_repeat(spark):
    doubled = _docs_df(
        spark,
        [(1, PASSAGE + _uniq(1, 6) + PASSAGE), (2, _uniq(2, 15))],
    )
    assert repeated_window_spans(doubled, w=W, scope="docs").count() == 0
    out = repeated_window_spans(
        doubled, w=W, scope="occurrences"
    ).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"]) for r in out} == {
        (1, 0, 12), (1, 18, 30)
    }


def test_remove_spans(spark, planted):
    spans = repeated_window_spans(planted, w=W)
    out = {
        r["doc_id"]: r["toks_clean"]
        for r in remove_spans(planted, spans).collect()
    }
    assert out[1] == _uniq(1, 3) + _uniq(1, 4, "b")
    assert out[2] == _uniq(2, 6)
    assert out[3] == _uniq(3, 7)
    assert out[4] == _uniq(4, 20)  # untouched: no spans, left join


def test_short_docs_contribute_nothing(spark):
    df = _docs_df(spark, [(1, ["x", "y"]), (2, ["x", "y"])])
    assert window_hashes(df, w=5).count() == 0
    assert repeated_window_spans(df, w=5).count() == 0


def test_arg_validation(spark, planted):
    with pytest.raises(ValueError, match="w must"):
        window_hashes(planted, w=0)
    with pytest.raises(ValueError, match="scope"):
        repeated_window_spans(planted, scope="bogus")
    with pytest.raises(ValueError, match="min_docs"):
        repeated_window_spans(planted, min_docs=0)


def test_partition_layout_invariance(spark, planted):
    base = {
        tuple(r)
        for r in repeated_window_spans(
            planted.repartition(5), w=W
        ).collect()
    }
    other = {
        tuple(r)
        for r in repeated_window_spans(
            planted.repartition(1), w=W
        ).collect()
    }
    assert base == other


def test_plan_no_cartesian_no_python(spark, planted):
    spans = repeated_window_spans(planted, w=W)
    plan = (
        remove_spans(planted, spans)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan  # pure column algebra end-to-end
