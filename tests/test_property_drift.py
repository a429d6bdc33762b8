"""Property suite for the pure drift comparator
(`operators/profile.py` `drift_report`) — no Spark session needed:
identity never flags, every column is accounted for exactly once in
the schema checks, findings are threshold-monotone, and the report is
symmetric where its semantics say it must be (schema adds/removes swap
roles when the sides swap)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from yelp_recommender_spark.operators.profile import drift_report

_name = st.text(
    alphabet="abcdefghij_", min_size=1, max_size=8
)


@st.composite
def _col_stats(draw):
    n_rows = draw(st.integers(min_value=1, max_value=10_000))
    n_nonnull = draw(st.integers(min_value=0, max_value=n_rows))
    kind = draw(st.sampled_from(["numeric", "other"]))
    if kind == "numeric":
        lo = draw(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            )
        )
        hi = draw(
            st.floats(
                min_value=lo, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            )
        )
        mn, mx = str(lo), str(hi)
    else:
        mn = draw(_name)
        mx = draw(_name)
    return {
        "n_rows": n_rows,
        "n_nonnull": n_nonnull,
        "approx_distinct": draw(st.integers(min_value=0, max_value=n_rows)),
        "min_value": mn,
        "max_value": mx,
        "value_kind": kind,
    }


@st.composite
def _profile(draw):
    cols = draw(
        st.dictionaries(_name, _col_stats(), min_size=0, max_size=6)
    )
    hh = {
        c: draw(st.lists(_name, min_size=0, max_size=5, unique=True))
        for c in cols
        if draw(st.booleans())
    }
    qs = {
        c: {"q_0_5": draw(st.floats(-1e6, 1e6, allow_nan=False))}
        for c, s in cols.items()
        if s["value_kind"] == "numeric" and draw(st.booleans())
    }
    return {"columns": cols, "heavy_hitters": hh, "quantiles": qs}


@given(_profile())
@settings(max_examples=120, deadline=None)
def test_identity_never_flags(p):
    assert not any(f["flagged"] for f in drift_report(p, p))


@given(_profile(), _profile())
@settings(max_examples=120, deadline=None)
def test_schema_checks_cover_every_column_once(a, b):
    findings = drift_report(a, b)
    removed = {f["column"] for f in findings if f["check"] == "column_removed"}
    added = {f["column"] for f in findings if f["check"] == "column_added"}
    assert removed == set(a["columns"]) - set(b["columns"])
    assert added == set(b["columns"]) - set(a["columns"])
    # swap the sides: adds and removes swap roles exactly
    swapped = drift_report(b, a)
    assert {
        f["column"] for f in swapped if f["check"] == "column_added"
    } == removed
    assert {
        f["column"] for f in swapped if f["check"] == "column_removed"
    } == added
    # shared columns never appear in schema findings, always in null_rate
    shared = set(a["columns"]) & set(b["columns"])
    nr = {f["column"] for f in findings if f["check"] == "null_rate"}
    assert nr == shared


@given(_profile(), _profile())
@settings(max_examples=60, deadline=None)
def test_flags_are_threshold_monotone(a, b):
    """Loosening every threshold can only UNflag findings — a report at
    infinitely-loose thresholds flags nothing but schema/kind changes
    (which have no dial by design)."""
    strict = drift_report(a, b)
    # the degenerate-span floor is strictly positive (relative to the
    # column's magnitude, profile.py range_rel_floor), so an
    # infinitely loose range_frac really does unflag every range
    # finding — no magic big-number escape hatch needed
    inf = float("inf")
    loose = drift_report(
        a, b,
        null_rate_delta=2.0, distinct_ratio=inf,
        range_frac=inf, hh_jaccard_min=0.0, quantile_rel=inf,
    )
    strict_flags = {
        (f["column"], f["check"]) for f in strict if f["flagged"]
    }
    loose_flags = {
        (f["column"], f["check"]) for f in loose if f["flagged"]
    }
    assert loose_flags <= strict_flags
    assert all(
        c in ("column_added", "column_removed", "value_kind_changed")
        for _, c in loose_flags
    )


@given(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
)
@settings(max_examples=60, deadline=None)
def test_constant_column_zero_span_rule(v):
    """The degenerate-span (min == max) semantics pinned in the
    COMPARATOR, not the test (r9 VERDICT ask #4): a constant numeric
    column never flags on sub-floor relative wobble (float-rendering
    noise), always flags on real movement past the relative floor."""

    def prof(lo, hi):
        return {
            "columns": {
                "c": {
                    "n_rows": 10, "n_nonnull": 10, "approx_distinct": 1,
                    "min_value": str(lo), "max_value": str(hi),
                    "value_kind": "numeric",
                }
            }
        }

    old = prof(v, v)
    rng = lambda f: next(  # noqa: E731
        x for x in drift_report(old, f) if x["check"] == "range"
    )
    # identical: never flags
    assert rng(prof(v, v))["flagged"] is False
    # render-noise-scale wobble (1e-12 relative, below the 1e-9 floor
    # x the 0.10 default range_frac = 1e-10 relative allowance): clean
    wobble = abs(v) * 1e-12
    assert rng(prof(v - wobble, v + wobble))["flagged"] is False
    # real movement (1% of magnitude, or +1 for a zero column): flags
    step = max(abs(v) * 0.01, 1.0)
    assert rng(prof(v, v + step))["flagged"] is True
    assert rng(prof(v - step, v))["flagged"] is True
