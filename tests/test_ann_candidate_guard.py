"""SRP-LSH candidate-volume guard (r10): the third-decade sweep caught
the LSH tier's quadratic-in-practice failure mode — at a non-selective
threshold the recall derivation pins n_planes LOW (threshold 0.5 /
recall 0.95 → 7 planes, 50 tables → 32% of ALL pairs become
candidates), so the candidate join explodes long before any output
bound applies. ``srp_candidate_estimate`` prices that join from
(n, k, T) alone — arithmetic, no scan — and ``candidate_guard``
warns/refuses with the evidence BEFORE the shuffle, the ``join_plan``
pattern pointed at the engine's own LSH tier.
"""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)
from yelp_recommender_spark.operators.ann import (
    cosine_pairs_above,
    cosine_pairs_above_auto,
    cosine_pairs_above_lsh,
    srp_candidate_estimate,
    srp_params_for_recall,
)

N = 60
DIM = 8


@pytest.fixture(scope="module")
def vectors(spark):  # noqa: F811
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((N, DIM))
    base[N - 1] = base[0] + 0.01 * rng.standard_normal(DIM)  # a true pair
    rows = [(i, [float(x) for x in base[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_estimate_arithmetic_names_the_q88_blowup():
    """The derived (7, 50) operating point at threshold 0.5 makes ~32%
    of all pairs candidates — ~4.06e10 rows / ~162k per doc at 500k
    docs. These are the third-decade numbers, reproduced from three
    ints with no cluster."""
    k, t = srp_params_for_recall(0.5, 0.95)
    assert (k, t) == (7, 50)
    est = srp_candidate_estimate(500_000, k, t)
    assert 0.30 < est["random_pair_candidate_frac"] < 0.35
    assert 3.9e10 < est["est_candidates"] < 4.2e10
    assert 150_000 < est["est_candidates_per_doc"] < 175_000

    # the SELECTIVE regime the LSH tier exists for: threshold 0.9
    # derives (16, 35) — 0.05% of pairs, ~267 candidates per doc at the
    # same 500k. Selectivity, not output bounding, is what scales LSH.
    k9, t9 = srp_params_for_recall(0.9, 0.95)
    assert k9 == 16
    sel = srp_candidate_estimate(500_000, k9, t9)
    assert sel["est_candidates_per_doc"] < 1_000


def test_estimate_monotone_in_n():
    """Candidates per doc grows ∝ n at fixed params — every
    fixed-parameter LSH pair join eventually explodes; the estimate
    names the n where."""
    k, t = 16, 35
    per_doc = [
        srp_candidate_estimate(n, k, t)["est_candidates_per_doc"]
        for n in (10_000, 100_000, 1_000_000)
    ]
    assert per_doc[0] < per_doc[1] < per_doc[2]
    assert per_doc[2] / max(per_doc[1], 1e-9) == pytest.approx(10.0, rel=0.01)


def test_guard_warn_records_and_results_identical(vectors):
    """Forcing a tiny per-doc budget trips the guard on the small
    fixture: warn mode emits UserWarning + records the verdict, raise
    mode refuses, and the RESULT is identical with the guard on, off,
    or recording — the guard changes what gets refused, never what
    gets computed."""
    kw = dict(threshold=0.4, n_planes=2, n_tables=3)
    baseline = sorted(
        cosine_pairs_above_lsh(
            vectors, candidate_guard=None, **kw
        ).collect()
    )
    assert baseline  # the planted near-dup pair survives

    out = {}
    with pytest.warns(UserWarning, match="candidate join is a multiplier"):
        warned = sorted(
            cosine_pairs_above_lsh(
                vectors, max_candidates_per_doc=1.0,
                candidate_guard="warn", decision_out=out, **kw
            ).collect()
        )
    assert warned == baseline
    assert out["explosion"] is True
    assert out["n_rows"] == N
    assert out["est_candidates_per_doc"] > 1.0

    with pytest.raises(ValueError, match="candidate join is a multiplier"):
        cosine_pairs_above_lsh(
            vectors, max_candidates_per_doc=1.0,
            candidate_guard="raise", **kw
        )


def test_guard_silent_when_budget_clears(vectors):
    """Default budget on a 60-row fixture: no warning, verdict recorded
    as non-explosive."""
    import warnings

    out = {}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = cosine_pairs_above_lsh(
            vectors, threshold=0.4, n_planes=2, n_tables=3,
            decision_out=out,
        ).collect()
    assert rows
    assert out["explosion"] is False


def test_auto_planner_records_tier_and_forwards_guard(vectors):
    """decision_out through the auto planner: exact rung records
    tier/n_rows and never consults the LSH guard; the LSH rung forwards
    the already-paid count (n_rows matches) and the guard verdict."""
    out = {}
    exact = cosine_pairs_above_auto(
        vectors, threshold=0.4, decision_out=out
    )
    assert out == {"tier": "exact", "n_rows": N}
    expected = sorted(
        r[:2] for r in cosine_pairs_above(vectors, threshold=0.4).collect()
    )
    assert sorted(r[:2] for r in exact.collect()) == expected

    out = {}
    with pytest.warns(UserWarning, match="candidate join is a multiplier"):
        lsh = cosine_pairs_above_auto(
            vectors, threshold=0.4, broadcast_limit=10,
            n_planes=2, n_tables=3, max_candidates_per_doc=1.0,
            decision_out=out,
        )
        lsh.count()
    assert out["tier"] == "lsh"
    assert out["n_rows"] == N  # the planner's count, not a re-scan
    assert out["explosion"] is True
