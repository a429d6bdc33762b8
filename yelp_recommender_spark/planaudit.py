"""Physical-plan audit — the PLANS.md methodology as a library + CLI
surface (``cli.py explain``): node counts from ``explain('formatted')``
with each node counted ONCE by its plan node id (cached/reused subtrees
re-expand in the formatted tree under their original ids, so unique-id
counting references them instead of double-counting — the convention
PLANS.md has used since r3).

Plan SHAPE is scale-independent, which is what makes these counts a
useful regression surface: an exchange that appears at sf0.001 is the
same exchange that shuffles 100 TB, and a CartesianProduct is a blowup
at any scale. AQE may still swap a shuffled join to broadcast at
runtime when a side turns out small — the audit pins the static plan.

The EXECUTED variants (:func:`executed_plan_counts`,
:func:`scan_relations` after :func:`run_to_completion`) pin the other
half — the r9 post-execution scan audit as a standing surface instead
of a one-off method: run the query, read the AQE-FINAL plan, and count
how many times each parquet relation is genuinely scanned (unique plan
node ids, so a ReusedExchange or cached subtree is credited, not
double-counted). The rule that audit established — a union of
differently-filtered views of one expensive subtree defeats exchange
reuse, so any relation read ≥3× with no reuse in sight is a recompute
multiplier — is enforced catalog-wide by
``tests/test_planaudit_executed.py`` and exposed as ``cli explain
--executed [--max-scans-per-relation N]`` (exit 2, the check-failed
code, on a violation).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_NODE_RE = re.compile(r"([A-Za-z][\w$ .-]*?)\s*\((\d+)\)\s*$")
_DETAIL_RE = re.compile(r"^\((\d+)\) ([A-Za-z][\w$ .-]*)")

_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
_ARROW_NODES = (
    "MapInPandas",
    "MapInArrow",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "TransformWithStateInPandas",
)


def formatted_plan(df: DataFrame) -> str:
    """The full ``explain('formatted')`` text, returned instead of
    printed (PySpark's ``DataFrame.explain`` only prints). Before the
    frame has executed this is the static plan
    (``AdaptiveSparkPlan isFinalPlan=false``); after
    :func:`run_to_completion` it is the AQE-final plan — same parser,
    both halves of the audit."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def run_to_completion(df: DataFrame) -> int:
    """Execute ``df``'s OWN query execution to completion (returns the
    row count) so the adaptive plan finalizes and subsequent
    :func:`formatted_plan`/:func:`plan_node_counts`/:func:`scan_relations`
    reads describe what actually RAN — runtime-reused exchanges, AQE
    join swaps, cache hits.

    ``df.count()``/``df.write`` build a NEW Dataset around the plan and
    execute THAT, leaving ``df``'s execution (what the audit reads)
    unfinalized — so this collects ``df`` itself and drops the rows.
    That bounds its use to audit scale (the PLANS.md sf0.001 contract):
    the collect IS the audit's action, not a production pattern."""
    return len(df.collect())


def _tree_nodes(text: str) -> dict[int, str]:
    """Unique plan node id → node name across the main tree and every
    subquery tree (reused/cached subtrees re-expand under their
    original ids, so the dict counts each physical node ONCE — the
    PLANS.md convention)."""
    nodes: dict[int, str] = {}
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("== Physical Plan ==") or line.lstrip().startswith(
            "Subquery:"
        ):
            i += 1
            while i < len(lines) and lines[i].strip():
                m = _NODE_RE.search(lines[i].rstrip())
                if m:
                    nodes.setdefault(int(m.group(2)), m.group(1).strip())
                i += 1
        else:
            i += 1
    return nodes


_LOCATION_RE = re.compile(r"Location:\s*\S+\s*\[([^\]]*)")


def scan_relations(df: DataFrame) -> dict[str, int]:
    """Relation → number of DISTINCT ``Scan parquet`` plan nodes
    reading it, from the current (static or, after
    :func:`run_to_completion`, AQE-final) plan.

    The relation label is the scan's file-index basename (the table
    directory: ``orders`` for ``.../orders.parquet``); a scan whose
    detail block carries no location (never the case for parquet
    scans) falls back to the node header. This is the r9
    post-execution audit's core measurement: a relation appearing ≥3
    times with no reuse means some shared subtree is being recomputed
    per branch — per-branch predicate pushdown makes the branches'
    exchanges non-identical, so Catalyst's exchange reuse can never
    fire on that shape, and the fix is re-expressing the union as one
    generator pass (BASELINE.md r9)."""
    text = formatted_plan(df)
    nodes = _tree_nodes(text)

    # detail blocks: "(id) NodeName" header then attribute lines
    locations: dict[int, str] = {}
    current_id: int | None = None
    for line in text.splitlines():
        m = _DETAIL_RE.match(line)
        if m:
            current_id = int(m.group(1))
            continue
        lm = _LOCATION_RE.search(line)
        if lm and current_id is not None and current_id not in locations:
            first = lm.group(1).split(",")[0].strip()
            base = first.rstrip("/").rsplit("/", 1)[-1]
            if base.endswith(".parquet"):
                base = base[: -len(".parquet")]
            locations[current_id] = base

    out: dict[str, int] = {}
    for nid, name in nodes.items():
        if not name.startswith("Scan parquet"):
            continue
        rel = locations.get(nid) or (
            name[len("Scan parquet"):].strip() or "<unknown>"
        )
        out[rel] = out.get(rel, 0) + 1
    return out


def executed_plan_counts(df: DataFrame) -> dict:
    """:func:`run_to_completion` then :func:`plan_node_counts` — the
    node-count audit over the plan that actually ran (AQE-final:
    runtime broadcast swaps applied, runtime-reused exchanges counted
    as ``reused_exchanges``, materialized caches as ``cached_scans``)."""
    run_to_completion(df)
    return plan_node_counts(df)


def plan_node_counts(df: DataFrame) -> dict:
    """Audit counts over the UNIQUE plan nodes of ``df``'s physical plan.

    Returns ``{exchanges, reused_exchanges, joins: {node: n},
    parquet_scans, pushed_filter_scans, cached_scans, arrow_stages}``.
    ``pushed_filter_scans`` counts parquet scans whose detail block
    carries a non-empty ``PushedFilters`` list — the predicate-pushdown
    check ("a scan that reads everything for a filtered query is
    wrong").

    Counts cover EVERY plan tree in the formatted text — the main plan
    and each ``===== Subqueries =====`` entry (scalar / dynamic-pruning
    subqueries carry their own exchanges, joins, and scans; an audit
    that only read the main tree would report a shuffle moved into a
    subquery as an improvement)."""
    text = formatted_plan(df)
    nodes = _tree_nodes(text)

    # detail blocks: "(id) NodeName" header, then attribute lines —
    # present for the main plan and for each subquery section alike
    pushed_ids: set[int] = set()
    current_id: int | None = None
    current_is_scan = False
    for line in text.splitlines():
        m = _DETAIL_RE.match(line)
        if m:
            current_id = int(m.group(1))
            current_is_scan = "Scan parquet" in m.group(2)
            continue
        if (
            current_is_scan
            and current_id is not None
            and line.startswith("PushedFilters: [")
            and not line.startswith("PushedFilters: []")
        ):
            pushed_ids.add(current_id)

    joins: dict[str, int] = {}
    counts = {
        "exchanges": 0,
        "reused_exchanges": 0,
        "parquet_scans": 0,
        "pushed_filter_scans": 0,
        "cached_scans": 0,
        "arrow_stages": 0,
    }
    for nid, name in nodes.items():
        head = name.split(" ")[0]
        if head == "Exchange" or head == "BroadcastExchange":
            # PLANS.md convention: "exchanges" = shuffle exchanges only
            # (a BroadcastExchange moves one bounded side, not the data)
            if head == "Exchange":
                counts["exchanges"] += 1
        elif head == "ReusedExchange":
            counts["reused_exchanges"] += 1
        elif head in _JOIN_NODES:
            joins[head] = joins.get(head, 0) + 1
        elif name.startswith("Scan parquet"):
            counts["parquet_scans"] += 1
            if nid in pushed_ids:
                counts["pushed_filter_scans"] += 1
        elif head == "InMemoryTableScan":
            counts["cached_scans"] += 1
        elif head in _ARROW_NODES:
            counts["arrow_stages"] += 1
    counts["joins"] = joins
    return counts


def audit_line(counts: dict) -> str:
    """One PLANS.md-style summary line from :func:`plan_node_counts`."""
    joins = (
        {k: counts["joins"][k] for k in sorted(counts["joins"])}
        if counts["joins"]
        else "none"
    )
    return (
        f"exchanges: {counts['exchanges']} "
        f"(+{counts['reused_exchanges']} reused); "
        f"joins: {joins}; "
        f"parquet scans: {counts['parquet_scans']} "
        f"({counts['pushed_filter_scans']} with pushed filters); "
        f"cached-table scans: {counts['cached_scans']}; "
        f"arrow stages: {counts['arrow_stages']}"
    )


# Queries whose RESULT construction executes streams or iterative ML
# fits as a side effect — auditing them would run half the suite, and
# their interesting plans live inside execution harnesses, not in the
# returned batch frame (same skip set as tests/test_plans.py).
AUDIT_SKIP = {
    "q42_ann_lsh_recall",
    "q43_ann_ivf_recall",
    "q44_ann_pq_recall",
    "q45_ann_ivfpq_recall",
    "q51_item_cf_weights",
    "q52_item_cf_predict",
    "q53_user_cf_predict",
    "q56_als_recommend",
    "q57_hybrid_recommend",
    "q59_streaming_hourly_counts",
    "q61_streaming_sessions",
    "q62_streaming_dedup",
    "q63_streaming_running_totals",
    "q72_streaming_attribution_join",
    "q79_stream_static_enrich",
    "q89_streaming_incremental_dedup",
    "q116_streaming_attribution_outer",
}


def audit_catalog(
    spark,
    sf_dir: str,
    names: list[str] | None = None,
    *,
    executed: bool = False,
) -> dict:
    """Audit every catalog query (or the given subset); returns
    ``{name: counts}`` where ``counts`` is :func:`plan_node_counts`
    plus a ``scans_by_relation`` map (:func:`scan_relations`). Skips
    :data:`AUDIT_SKIP` unless explicitly named. ``executed=True`` runs
    each query to completion first, so the audit reads the AQE-final
    plan — session caches materialize in catalog order, exactly as a
    sequential consumer would see them."""
    from yelp_recommender_spark.queries import QUERIES

    if names is None:
        names = [n for n in sorted(QUERIES) if n not in AUDIT_SKIP]
    out = {}
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        if executed:
            run_to_completion(df)
        counts = plan_node_counts(df)
        counts["scans_by_relation"] = scan_relations(df)
        out[name] = counts
    return out
