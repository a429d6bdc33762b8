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
    printed (PySpark's ``DataFrame.explain`` only prints)."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


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

    # tree sections: the main plan (after "== Physical Plan ==") and one
    # per "Subquery:N ..." header, each ending at its first blank line
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
                    # node ids are unique across the whole text; reused
                    # subtrees re-expand under their original ids, so
                    # setdefault counts each once (PLANS.md convention)
                    nodes.setdefault(int(m.group(2)), m.group(1).strip())
                i += 1
        else:
            i += 1

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


def audit_catalog(spark, sf_dir: str, names: list[str] | None = None) -> dict:
    """Audit every catalog query (or the given subset); returns
    ``{name: counts}``. Skips :data:`AUDIT_SKIP` unless explicitly
    named."""
    from yelp_recommender_spark.queries import QUERIES

    if names is None:
        names = [n for n in sorted(QUERIES) if n not in AUDIT_SKIP]
    out = {}
    for name in names:
        out[name] = plan_node_counts(QUERIES[name](spark, sf_dir))
    return out
