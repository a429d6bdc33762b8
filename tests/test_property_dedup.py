"""Property-based exactness checks (hypothesis) for the trickiest
operator: blocked_jaccard_pairs' cold-overlap bound logic. The claim —
every pair sharing ≥1 cold (df ≤ cap) shingle with rounded Jaccard ≥
threshold is emitted with the exact value, pairs sharing ONLY hot
shingles are excluded by design — is verified against a plain-Python
brute force over random corpora, caps, and thresholds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

ALPHABET = [f"s{i}" for i in range(8)]

corpus_st = st.lists(
    st.frozensets(st.sampled_from(ALPHABET), min_size=1, max_size=6),
    min_size=2,
    max_size=8,
)


def _brute(docs: list[frozenset], df_cap: int, threshold: float):
    from collections import Counter

    df = Counter(s for d in docs for s in d)
    hot = {s for s, n in df.items() if n > df_cap}
    out = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = docs[i] & docs[j]
            if not (inter - hot):  # no shared cold shingle → invisible
                continue
            jac = round(len(inter) / len(docs[i] | docs[j]), 6)
            if jac >= threshold:
                out[(i, j)] = jac
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=corpus_st,
    df_cap=st.integers(min_value=1, max_value=3),
    threshold=st.sampled_from([0.25, 0.5]),
)
def test_blocked_jaccard_matches_bruteforce(spark, docs, df_cap, threshold):  # noqa: F811
    from yelp_recommender_spark.operators.dedup import blocked_jaccard_pairs

    rows = [(i, sorted(d)) for i, d in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    got = {
        (r.d1, r.d2): r.jaccard
        for r in blocked_jaccard_pairs(
            sdf, threshold=threshold, df_cap=df_cap
        ).collect()
    }
    assert got == _brute(list(docs), df_cap, threshold)


@settings(max_examples=200, deadline=None)
@given(
    threshold=st.floats(min_value=0.05, max_value=0.99),
    target=st.floats(min_value=0.5, max_value=0.99),
)
def test_srp_params_always_meet_target_within_budget(threshold, target):
    from yelp_recommender_spark.operators.ann import (
        srp_expected_recall,
        srp_params_for_recall,
    )

    k, t = srp_params_for_recall(threshold, target, max_tables=64)
    assert 1 <= k <= 16 and 1 <= t <= 64
    # the derived config meets the target whenever ANY config within the
    # budget could (one plane, max tables is the most permissive shape)
    if srp_expected_recall(threshold, 1, 64) >= target:
        assert srp_expected_recall(threshold, k, t) >= min(target, 0.9999)
