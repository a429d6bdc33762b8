"""Property-based pins for the repeated-span contract (hypothesis):
for ANY random corpus over a tiny alphabet (repeats arise naturally),
window width, threshold, and scope —

- `repeated_window_spans` equals a pure-Python reference (window
  tuples → recurrence count → islands merge) EXACTLY, including span
  boundaries and the per-span hit-window count;
- `remove_spans` equals positional filtering against those spans;
- spans never overlap, are in-bounds, and each is >= w tokens.

The unit tests use planted passages; random corpora fall to hypothesis:
repeats touching doc edges, nested/adjacent repeats, docs shorter than
w, a doc repeating a window against ITSELF under the occurrences scope,
and min_docs=1 (every window its own span)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

ALPHABET = ["a", "b", "c", "d"]

docs_st = st.lists(
    st.lists(st.sampled_from(ALPHABET), min_size=0, max_size=14),
    min_size=1,
    max_size=5,
)


def _reference(docs, w, min_docs, scope):
    """Pure-Python replay of the documented contract."""
    windows = {}  # tuple -> list[(doc, start)]
    for d, toks in docs:
        for s in range(len(toks) - w + 1):
            windows.setdefault(tuple(toks[s : s + w]), []).append((d, s))
    repeated = {
        win
        for win, occ in windows.items()
        if (
            len({d for d, _ in occ}) if scope == "docs" else len(occ)
        )
        >= min_docs
    }
    spans = {}
    for d, toks in docs:
        hits = sorted(
            s
            for s in range(len(toks) - w + 1)
            if tuple(toks[s : s + w]) in repeated
        )
        out = []
        for s in hits:
            if out and s <= out[-1][1]:  # starts at/inside running end
                out[-1][1] = max(out[-1][1], s + w)
                out[-1][2] += 1
            else:
                out.append([s, s + w, 1])
        spans[d] = [(a, b, n) for a, b, n in out]
    return spans


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=docs_st,
    w=st.integers(min_value=1, max_value=4),
    min_docs=st.integers(min_value=1, max_value=3),
    scope=st.sampled_from(["docs", "occurrences"]),
)
def test_span_contract_properties(spark, docs, w, min_docs, scope):  # noqa: F811
    from yelp_recommender_spark.operators.spans import (
        remove_spans,
        repeated_window_spans,
    )

    docs = list(enumerate(docs))
    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    got_rows = repeated_window_spans(
        df, w=w, min_docs=min_docs, scope=scope
    ).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_windows"])
        )
    want = _reference(docs, w, min_docs, scope)
    for d in got:
        got[d].sort()
    assert got == {d: s for d, s in want.items() if s}

    # structural invariants on every emitted span
    for d, spans in got.items():
        toklen = len(dict(docs)[d])
        prev_end = -1
        for s, e, n in spans:
            assert 0 <= s and e <= toklen and e - s >= w
            assert s > prev_end  # merged: no overlap, no adjacency gap-0
            assert 1 <= n <= e - s - w + 1
            prev_end = e

    cleaned = {
        r["doc_id"]: r["toks_clean"]
        for r in remove_spans(
            df, repeated_window_spans(df, w=w, min_docs=min_docs, scope=scope)
        ).collect()
    }
    for d, toks in docs:
        covered = set()
        for s, e, _ in want.get(d, []):
            covered.update(range(s, e))
        assert cleaned[d] == [
            t for i, t in enumerate(toks) if i not in covered
        ]
