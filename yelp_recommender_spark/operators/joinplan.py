"""Sketch-backed join planning: decide broadcast vs shuffle vs salted —
and catch a join about to EXPLODE — *before* paying for the join.

Catalyst already picks broadcast-hash vs sort-merge from size stats,
and AQE re-plans from runtime shuffle sizes. What neither gives you at
100 TB is the OUTPUT cardinality of a many-to-many equi-join before
the shuffle runs: a gram/band/key join whose hot keys multiply can
produce 1000× its inputs, and the first sign is an executor OOM an
hour in. The count-min join-size estimator
(:func:`~yelp_recommender_spark.operators.sketch.cms_join_size`,
Cormode & Muthukrishnan) answers exactly that from two bounded grids
built in one scan per side.

:func:`join_plan` is deliberately LAZY about cost, in escalation
order, because the planner must stay much cheaper than the join it
protects:

1. Count the RIGHT side only (the candidate broadcast/replica side),
   along with its max key multiplicity — one tiny aggregation over the
   side that must be small anyway. At or under ``broadcast_rows`` with
   (near-)unique keys the decision is already made — broadcast, output
   provably bounded at mult × n_left — and the big left side is never
   scanned by the planner. A small-but-repeated-key right side
   (mult > explosion_factor) escalates anyway: broadcast remains the
   physical shape, but the output estimate must carry evidence (a
   100-row side whose keys repeat 100× can still multiply the join
   100×).
2. Otherwise build a count-min grid over the join key on each side
   (ONE scan per side, bounded depth×width state), and derive from
   the grids alone: exact non-null row counts (the d=0 row of each
   grid), the one-sided join-output estimate (min-over-depths inner
   product), and a one-sided upper bound on each side's heaviest key
   (min over depths of the max cell — every depth's max cell ≥ the
   true max key count). No second scan, no per-key state.

The decision record is a plain dict (everything the planner collected
is sketch-sized — the documented bounded-``collect`` contract);
:func:`planned_join` executes it: ``broadcast`` → broadcast-hint join,
``salted`` → :func:`~yelp_recommender_spark.operators.skew.salted_join`
(hot left keys spread over n_salts reducers), ``shuffle`` → plain
join. The result is IDENTICAL to ``left.join(right, on, how)`` in all
three cases — the plan changes the physical shape only.

Production consumers: the curate pipeline's decontamination gram join
(`curate.py` — the one many-to-many-risk join in the pipeline, its
decision recorded in the run report) and the ``explain-join`` CLI
(exit 3 on an explosion verdict, like ``skew-check``).

No reference counterpart — the reference joins driver-side dicts
(`models/item_cf_model.py:53`); this is the planning surface those
workloads need the moment they distribute.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yelp_recommender_spark.operators.sketch import cms_join_size, cms_state

__all__ = ["join_plan", "planned_join", "self_join_size"]

_KEY = "_jp_key"

# the planner's contract is LEFT-preserving joins (the same one
# salted_join enforces: the right side is the replicated/broadcast
# side, so right/full-preserving flavors would silently invert the
# semantics under a salted or broadcast decision). Spark's aliases
# normalize to four canonical forms.
_HOW = {
    "inner": "inner",
    "left": "left",
    "leftouter": "left",
    "left_outer": "left",
    "semi": "left_semi",
    "leftsemi": "left_semi",
    "left_semi": "left_semi",
    "anti": "left_anti",
    "leftanti": "left_anti",
    "left_anti": "left_anti",
}


def _norm_how(how: str) -> str:
    """Canonical join flavor, or ``ValueError`` for anything that is
    not left-preserving — validated UP FRONT so the error surface is
    plan-independent (a right/full join must not succeed under a
    broadcast decision and raise under a salted one)."""
    canon = _HOW.get(str(how).lower())
    if canon is None:
        raise ValueError(
            f"join plan supports left-preserving joins only "
            f"(inner/left/left_semi/left_anti), got how={how!r} — a "
            "right- or full-preserving join would invert the planned "
            "left/right roles; swap the sides instead"
        )
    return canon


def _keyed(df: DataFrame, keys: list[str]) -> DataFrame:
    """The join key as ONE column: a bare column for a single key (so
    the grid hashes the value itself), a struct for composite keys.
    Rows with any NULL key component are dropped to match equi-join
    semantics (NULL never matches)."""
    from yelp_recommender_spark.operators.profile import _c

    cond = None
    for k in keys:
        c = _c(df, k).isNotNull()
        cond = c if cond is None else (cond & c)
    if len(keys) == 1:
        col = _c(df, keys[0])
    else:
        col = F.struct(*[_c(df, k).alias(k) for k in keys])
    return df.where(cond).select(col.alias(_KEY))


def _grid_scalars(state: DataFrame) -> tuple[int, float]:
    """(n_rows, max_key_upper) off a CMS grid, no input rescan: the
    d=0 row sums to the exact non-null row count (every row increments
    exactly one cell per depth), and min-over-depths of the max cell
    is a one-sided upper bound on the heaviest key's count (each
    depth's max cell ≥ the true max; collisions only raise it)."""
    rows = state.groupBy("d").agg(
        F.sum("n").alias("_n"), F.max("n").alias("_mx")
    ).collect()  # bounded: one row per depth
    if not rows:
        return 0, 0.0
    n = int(rows[0]["_n"])  # identical at every depth
    return n, float(min(int(r["_mx"]) for r in rows))


def join_plan(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    how: str = "inner",
    broadcast_rows: int = 1_000_000,
    explosion_factor: float = 4.0,
    whale_frac: float = 0.10,
    depth: int = 5,
    width: int = 8192,
) -> dict:
    """Plan an equi-join of ``left`` (the big/preserved side) against
    ``right`` (the candidate broadcast/replica side) on ``on``.

    Returns a dict with ``strategy`` ∈ ``broadcast | salted |
    shuffle``, ``explosion`` (True when the estimated output exceeds
    ``explosion_factor ×`` the combined input rows — the join is a
    multiplier, not a filter), and the evidence: ``n_left``/``n_right``
    (non-null-key rows; ``n_left`` is None when step 1 decided without
    scanning the left side), ``est_join_rows`` (one-sided — never an
    underestimate beyond CMS collisions), ``amplification``, and
    ``max_key_frac_left/right`` (one-sided upper bounds).

    Estimate semantics (``estimate_semantics: "inner_matches"`` in the
    returned dict): ``est_join_rows`` is always the INNER-match count —
    Σ_v f_left(v)·f_right(v) over non-NULL keys. ``est_output_rows``
    adjusts it to the requested ``how``, staying one-sided (never an
    underestimate of the non-NULL-key output):

    - ``inner`` — ``est_join_rows`` itself;
    - ``left`` — ``est_join_rows + n_left`` (matches plus every left
      row as potentially unmatched — an upper bound);
    - ``left_semi`` — ``min(n_left, est_join_rows)`` (each left row
      appears at most once, and only if matched);
    - ``left_anti`` — ``n_left`` (at most every left row survives).

    NULL-key left rows are NOT in ``n_left`` or any estimate: NULL
    never equi-matches, but ``left``/``left_anti`` PRESERVE such rows,
    so the true output exceeds ``est_output_rows`` by exactly the
    left side's NULL-key row count — the planner never scans for it.
    ``explosion`` compares ``est_output_rows`` (when computed) to the
    inputs, so a semi/anti join — whose output is capped at ``n_left``
    — never flags.

    ``explosion`` is a WARNING flag orthogonal to the strategy: an
    exploding join may still have to run (decontamination does), but
    the caller gets to budget — or refuse — with the estimate in hand.
    """
    keys = [on] if isinstance(on, str) else list(on)
    canon = _norm_how(how)
    # step 1 aggregates keyed_r, and an escalation re-reads the same
    # lineage for the grid build — persist across both so an expensive
    # right lineage (a distinct over an exploded table) is computed
    # once, keeping the module's one-scan-per-side claim true for
    # every caller, not just those that pre-persisted
    keyed_r = _keyed(right, keys).persist()
    try:
        n_right, mult = (
            keyed_r.groupBy(_KEY)
            .count()
            .agg(
                F.sum("count").alias("_n"),
                F.max("count").alias("_m"),
            )
            .collect()[0]
        )
        n_right = int(n_right or 0)
        mult = int(mult or 0)
        plan: dict = {
            "on": keys,
            "how": canon,
            "estimate_semantics": "inner_matches",
            "n_right": int(n_right),
            "n_left": None,
            "est_join_rows": None,
            "est_output_rows": None,
            "amplification": None,
            "max_key_frac_left": None,
            "max_key_frac_right": None,
            "right_max_multiplicity": mult,
            "explosion": False,
            "thresholds": {
                "broadcast_rows": int(broadcast_rows),
                "explosion_factor": float(explosion_factor),
                "whale_frac": float(whale_frac),
            },
        }
        if n_right <= broadcast_rows and mult <= explosion_factor:
            # decided without ever scanning the left side — the
            # planner's cost must stay far below the join's. Safe to
            # skip the output estimate: every left row matches at most
            # `mult` right rows, so the output is bounded at
            # mult × n_left — no explosion beyond the factor is
            # possible
            plan["strategy"] = "broadcast"
            return plan

        # the grids are read three times (per-side scalars + the inner
        # product) — persist them so each input is scanned exactly
        # ONCE; grid size is bounded at depth×width rows, so the cache
        # is tiny
        ga = cms_state(
            _keyed(left, keys), _KEY, depth=depth, width=width
        ).persist()
        gb = cms_state(keyed_r, _KEY, depth=depth, width=width).persist()
        try:
            n_left, max_l = _grid_scalars(ga)
            _, max_r = _grid_scalars(gb)
            est = float(
                cms_join_size(ga, gb).collect()[0]["est_join_rows"]
            )
        finally:
            ga.unpersist()
            gb.unpersist()
        plan["n_left"] = n_left
        plan["est_join_rows"] = est
        if canon == "inner":
            out_est = est
        elif canon == "left":
            out_est = est + float(n_left)
        elif canon == "left_semi":
            out_est = float(min(float(n_left), est))
        else:  # left_anti
            out_est = float(n_left)
        plan["est_output_rows"] = out_est
        denom = max(n_left + n_right, 1)
        plan["amplification"] = est / denom
        plan["max_key_frac_left"] = max_l / max(n_left, 1)
        plan["max_key_frac_right"] = max_r / max(n_right, 1)
        plan["explosion"] = out_est > explosion_factor * denom
        # a small-but-REPEATED-key right side (mult > factor) reaches
        # here so its explosion flag carries evidence — but broadcast
        # is still the right physical shape for a side this small
        if n_right <= broadcast_rows:
            plan["strategy"] = "broadcast"
            return plan
        # salting replicates the RIGHT side n_salts×, so it only pays
        # when that side is a broadcast candidate that just missed the
        # threshold (salted_join's own sizing rule); a left whale
        # against a huge right side goes to the plain shuffle, where
        # AQE's skew-join splitting is the runtime remedy
        plan["strategy"] = (
            "salted"
            if plan["max_key_frac_left"] >= whale_frac
            and n_right <= 8 * broadcast_rows
            else "shuffle"
        )
        return plan
    finally:
        keyed_r.unpersist()


def self_join_size(
    df: DataFrame,
    on: str | Sequence[str],
    *,
    explosion_factor: float = 4.0,
    depth: int = 5,
    width: int = 8192,
) -> dict:
    """Output-size estimate for a SELF-equi-join on ``on`` — the shape
    of the CF co-rating join (pairs of entities sharing a context) and
    the LSH band-key candidate join, where both sides are the SAME
    relation: one CMS grid built in ONE scan serves both sides, and
    its self inner product (min over depths) is a one-sided estimate
    of Σ_v f(v)² ≥ the full self-join output.

    Returns ``{n_rows, est_join_rows, est_pairs, amplification,
    max_key_frac, explosion}``: ``est_pairs = (est_join_rows −
    n_rows) / 2`` is the ordered-pair count after the canonical
    ``a < b`` filter — one-sided too, since est ≥ Σ f² implies
    (est − Σf)/2 ≥ Σ f(f−1)/2. ``explosion`` flags
    ``est_pairs > explosion_factor × n_rows`` — the join is a
    multiplier, not a filter — BEFORE the shuffle pays for it.
    ``max_key_frac`` upper-bounds the heaviest key's share (the whale
    context / hot band key)."""
    keys = [on] if isinstance(on, str) else list(on)
    g = cms_state(
        _keyed(df, keys), _KEY, depth=depth, width=width
    ).persist()
    try:
        n, mx = _grid_scalars(g)
        est = float(cms_join_size(g, g).collect()[0]["est_join_rows"])
    finally:
        g.unpersist()
    est_pairs = max((est - float(n)) / 2.0, 0.0)
    return {
        "on": keys,
        "n_rows": n,
        "est_join_rows": est,
        "est_pairs": est_pairs,
        "amplification": est_pairs / max(n, 1),
        "max_key_frac": mx / max(n, 1),
        "explosion": est_pairs > explosion_factor * n,
        "thresholds": {"explosion_factor": float(explosion_factor)},
    }


def planned_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    *,
    plan: dict | None = None,
    n_salts: int = 8,
    decision_out: dict | None = None,
    **plan_kw,
) -> DataFrame:
    """``left.join(right, on, how)`` with the physical shape chosen by
    :func:`join_plan`: identical rows whichever path runs (the q71
    salting-invisible contract). ``plan`` short-circuits re-planning
    when the caller already has one; ``decision_out`` (a caller dict,
    updated in place) exposes the decision for reports and tests.

    Left-preserving joins only (inner/left/left_semi/left_anti) — the
    same contract as ``salted_join``, and the broadcast hint also
    builds on the right side. Validated up front, so the error surface
    is plan-independent: a right/full join raises here whichever
    strategy the data would have picked."""
    keys = [on] if isinstance(on, str) else list(on)
    how = _norm_how(how)
    if plan is None:
        plan = join_plan(left, right, keys, how=how, **plan_kw)
    if decision_out is not None:
        decision_out.update(plan)
    strategy = plan["strategy"]
    if strategy == "broadcast":
        return left.join(F.broadcast(right), keys, how)
    if strategy == "salted":
        from yelp_recommender_spark.operators.skew import salted_join

        return salted_join(left, right, keys, n_salts=n_salts, how=how)
    return left.join(right, keys, how)
