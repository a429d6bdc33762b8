"""The r9 post-execution scan audit as STANDING surface (r10): run a
query, read the AQE-final plan, count how many times each parquet
relation is genuinely scanned (unique plan-node ids — cached/reused
subtrees are credited, not double-counted), and enforce the rule that
audit established: a union of differently-filtered views of one
expensive subtree defeats Catalyst exchange reuse (per-branch predicate
pushdown makes the exchanges non-identical), so a relation read many
times with no reuse is a recompute multiplier that must be re-expressed
as one generator pass (BASELINE.md r9 — mg_state, scd2_merge,
cf.symmetrize, encode_business_features were all this shape).

The catalog-wide gate below is the enforcement: what r9 did once by
hand now fails CI when a future edit re-introduces the shape.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)
from yelp_recommender_spark.planaudit import (
    audit_catalog,
    executed_plan_counts,
    formatted_plan,
    plan_node_counts,
    run_to_completion,
    scan_relations,
)


def test_scan_relations_counts_unique_scan_nodes(spark):  # noqa: F811
    """One read = one scan; the r9 multiplier shape (filter+union of
    the SAME subtree) = two distinct scan nodes over the same relation
    — exactly what the audit exists to surface."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert scan_relations(orders.select("o_orderkey")) == {"orders": 1}

    split = orders.where("o_totalprice > 1000").union(
        orders.where("o_totalprice <= 1000")
    )
    assert scan_relations(split) == {"orders": 2}

    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    rels = scan_relations(joined)
    assert rels["orders"] == 1 and rels["customer"] == 1


def test_run_to_completion_finalizes_adaptive_plan(spark):  # noqa: F811
    """Before execution the plan is static (isFinalPlan=false); after
    run_to_completion the SAME frame's formatted plan is the AQE-final
    one — df.count()/df.write would execute a new Dataset and leave
    the audited execution unfinalized, which is why the helper exists."""
    agg = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderstatus")
        .count()
    )
    assert "isFinalPlan=false" in formatted_plan(agg)
    n = run_to_completion(agg)
    assert n > 0
    assert "isFinalPlan=true" in formatted_plan(agg)


def test_executed_counts_match_static_node_schema(spark):  # noqa: F811
    """executed_plan_counts returns the same audit dict shape as the
    static audit, read off the final plan."""
    agg = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_custkey")
        .count()
    )
    counts = executed_plan_counts(agg)
    static = plan_node_counts(agg)
    assert set(counts) == set(static)
    assert counts["parquet_scans"] == 1
    assert counts["exchanges"] >= 1


# Relations a query may scan more than the default cap, each a
# documented by-design shape (the r9 audit's own exception list) —
# everything else in the catalog must stay at <= 2 scans per relation.
# The r10 sweep FIXED the shapes that were genuine recompute
# multipliers instead of allowing them: the ratings derivation
# (26 lineitem scans in q55's executed plan → 1, session cache),
# the content/extended profile fan-outs, and q98's cohort diamond.
_ALLOWED = {
    # 4-branch synthetic CDC change feed + base read: the query's
    # PURPOSE is four differently-typed branches over the same table
    "q103_cdc_apply": {"customer": 5},
    # state build + insert feed + retraction feed are all derived from
    # the one fact table here; in production the deltas arrive
    # externally and the base is scanned once
    "q105_incremental_agg": {"lineitem": 3},
    # row-level checks compile into ONE pass; the set-level checks
    # (uniqueness, referential) need their own aggregates by nature
    "q115_quality_report": {"lineitem": 3},
    # bag/set-op teaching twin: each INTERSECT/EXCEPT side is its own
    # scan of the derived bags, deliberately kept in oracle shape
    "q120_bag_set_ops": {"lineitem": 4},
    # J7's deliberate union teaching twin (25-row nation, kept in the
    # fwd∪rev form its SQL oracle uses — BASELINE r9)
    "q14_symmetrized_pairs": {"nation": 4},
    # two synthetic snapshots + the diff both derive from orders
    "q90_snapshot_diff": {"orders": 3},
    # the SCD2 fixture constructs a multi-version snapshot SERIES from
    # customer; 10 is the post-r9-fix floor (BASELINE r9: 18 → 10)
    "q91_scd2_merge": {"customer": 10},
}
_DEFAULT_CAP = 2


def test_catalog_executed_scan_multiplier_gate(spark):  # noqa: F811
    """THE gate: every batch catalog query, executed at audit scale,
    scans no parquet relation more than twice (beyond the documented
    exceptions). A regression to the filter+union-of-one-subtree shape
    anywhere in the package fails here, not in a 100 TB run."""
    from yelp_recommender_spark.cache import clear_caches

    clear_caches()  # deterministic cache materialization order
    audits = audit_catalog(spark, SF_DIR, executed=True)
    offenders = {}
    for name, counts in sorted(audits.items()):
        for rel, n in counts["scans_by_relation"].items():
            cap = _ALLOWED.get(name, {}).get(rel, _DEFAULT_CAP)
            if n > cap:
                offenders.setdefault(name, {})[rel] = n
    assert not offenders, (
        "recompute-multiplier shapes (relation scanned more than "
        f"allowed in the executed plan): {offenders}"
    )


def test_cli_explain_executed_gate_exit_codes(spark, capsys):  # noqa: F811
    """cli explain --executed prints per-relation scans; the
    --max-scans-per-relation gate exits 0 clean and 2 (check-failed,
    the unified matrix) on violation."""
    from yelp_recommender_spark import cli

    cli.main(
        [
            "explain", "--query", "q01_pricing_summary",
            "--executed", "--max-scans-per-relation", "2",
            "--sf-dir", SF_DIR,
        ]
    )
    out = capsys.readouterr().out
    assert "scans by relation" in out
    assert "recompute-multiplier gate ok" in out

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as e:
            cli.main(
                [
                    "explain", "--query", "q01_pricing_summary",
                    "--executed", "--max-scans-per-relation", "0",
                    "--sf-dir", SF_DIR,
                ]
            )
    assert e.value.code == cli.EXIT_CHECK_FAILED
    assert "gate FAILED" in buf.getvalue()
