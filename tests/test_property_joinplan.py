"""Property suite for the sketch-backed join planner
(`operators/joinplan.py`), the r9 VERDICT asks #2/#3: the estimate's
one-sided guarantee against EXACT join sizes across random key
multiplicity distributions and all four left-preserving flavors, the
CMS upper-bound envelope, strategy invariance under row order and
partitioning, and the plan-independent `how` validation surface."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)

from yelp_recommender_spark.operators.joinplan import (
    join_plan,
    planned_join,
    self_join_size,
)

HOWS = ("inner", "left", "left_semi", "left_anti")


def _exact_output(lk: list[int], rk: list[int], how: str) -> int:
    """Exact non-NULL-key join output size from the key multisets —
    pure Python, no Spark job per hypothesis example."""
    ca, cb = Counter(lk), Counter(rk)
    if how == "inner":
        return sum(ca[k] * cb[k] for k in ca)
    if how == "left":
        return sum(ca[k] * cb[k] if cb[k] else ca[k] for k in ca)
    if how == "left_semi":
        return sum(ca[k] for k in ca if cb[k])
    return sum(ca[k] for k in ca if not cb[k])  # left_anti


keys_st = st.lists(st.integers(0, 12), min_size=1, max_size=30)


def test_estimates_bracket_exact_sizes(spark):  # noqa: F811
    """est_join_rows is never below the exact inner-match count and
    stays inside the CMS envelope (true + e/width·N_A·N_B, with slack
    for the min-over-depths tail); est_output_rows is never below the
    exact output of the requested flavor."""

    @given(keys_st, keys_st, st.sampled_from(HOWS))
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(lk, rk, how):
        a = spark.createDataFrame([(k,) for k in lk], "k long")
        b = spark.createDataFrame([(k,) for k in rk], "k long")
        plan = join_plan(a, b, "k", how=how, broadcast_rows=0)
        true_inner = _exact_output(lk, rk, "inner")
        true_out = _exact_output(lk, rk, how)
        width = 8192
        slack = 2.0 + math.e / width * len(lk) * len(rk)
        assert plan["est_join_rows"] >= float(true_inner)
        assert plan["est_join_rows"] <= true_inner + slack
        assert plan["est_output_rows"] >= float(true_out)
        assert plan["estimate_semantics"] == "inner_matches"
        assert plan["how"] == how
        # semi/anti are capped at the left row count — no explosion
        if how in ("left_semi", "left_anti"):
            assert plan["est_output_rows"] <= float(len(lk))
            assert plan["explosion"] is False

    prop()


def test_output_estimates_vs_real_joins(spark):  # noqa: F811
    """One planted fixture, all four flavors against ACTUAL Spark join
    counts — the end-to-end pin behind the pure-Python oracle above."""
    lk = [1] * 5 + [2] * 3 + [3] * 4 + [9]  # key 9 unmatched
    rk = [1] * 2 + [2] * 6 + [7]  # key 7 right-only
    a = spark.createDataFrame([(k, f"l{i}") for i, k in enumerate(lk)], "k long, lp string")
    b = spark.createDataFrame([(k, f"r{i}") for i, k in enumerate(rk)], "k long, rp string")
    for how in HOWS:
        plan = join_plan(a, b, "k", how=how, broadcast_rows=0)
        exact = a.join(b, "k", how).count()
        assert plan["est_output_rows"] >= float(exact), (how, plan)
        # identical rows through planned_join whatever the plan said
        got = planned_join(a, b, "k", how, plan=plan).count()
        assert got == exact


def test_null_keys_documented_exclusion(spark):  # noqa: F811
    """NULL-key left rows are preserved by left/left_anti but excluded
    from n_left and the estimates — the documented contract: the true
    output exceeds est_output_rows by exactly the NULL-key row count."""
    a = spark.createDataFrame(
        [(1, "x"), (1, "y"), (None, "n1"), (None, "n2")], "k int, lp string"
    )
    b = spark.createDataFrame([(1,), (2,)], "k int")
    plan = join_plan(a, b, "k", how="left", broadcast_rows=0)
    assert plan["n_left"] == 2  # NULL keys excluded
    true_left = a.join(b, "k", "left").count()  # 2 matches + 2 NULL rows
    assert true_left == 4
    n_null = a.filter(F.col("k").isNull()).count()
    assert plan["est_output_rows"] + n_null >= true_left


def test_strategy_invariant_under_order_and_partitioning(spark):  # noqa: F811
    """The plan is a pure function of the key multisets: shuffling row
    order and changing partitioning must reproduce the identical
    decision dict (counts are exact sums, CMS cells are exact sums —
    nothing order-dependent)."""
    a = spark.range(4_000).select(
        F.when(F.col("id") < 2_000, F.lit(5))
        .otherwise(F.col("id"))
        .cast("long")
        .alias("k")
    )
    b = spark.range(1_500).select((F.col("id") % 700).alias("k"))
    base = join_plan(a, b, "k", broadcast_rows=100)
    for variant in (
        a.orderBy(F.col("k").desc()),
        a.repartition(17),
        a.repartition(3, "k"),
    ):
        assert join_plan(variant, b, "k", broadcast_rows=100) == base
    assert base["strategy"] in ("salted", "shuffle")


def test_how_validation_is_plan_independent(spark):  # noqa: F811
    """right/full/cross raise up front in BOTH join_plan and
    planned_join — even when a precomputed plan is supplied, and
    regardless of which strategy the data would have picked."""
    a = spark.range(100).select(F.col("id").alias("k"))
    b = spark.range(10).select(F.col("id").alias("k"))
    good = join_plan(a, b, "k")
    for bad in ("right", "full", "outer", "cross", "right_outer"):
        with pytest.raises(ValueError, match="left-preserving"):
            join_plan(a, b, "k", how=bad)
        with pytest.raises(ValueError, match="left-preserving"):
            planned_join(a, b, "k", bad, plan=good)
    # every alias spelling of the allowed flavors is accepted
    for ok in ("inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"):
        planned_join(a, b, "k", ok, plan=good)


def test_self_join_pair_estimate_one_sided(spark):  # noqa: F811
    """self_join_size: est_pairs is never below the exact a<b pair
    count Σ m(m-1)/2 over contexts, and n_rows is exact."""

    @given(st.lists(st.integers(0, 8), min_size=1, max_size=30))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(ks):
        df = spark.createDataFrame(
            [(k, i) for i, k in enumerate(ks)], "ctx long, e long"
        )
        info = self_join_size(df, "ctx")
        true_pairs = sum(m * (m - 1) // 2 for m in Counter(ks).values())
        assert info["n_rows"] == len(ks)
        assert info["est_pairs"] >= float(true_pairs)

    prop()


def test_self_join_explosion_on_hot_key(spark):  # noqa: F811
    """A planted whale context flips the explosion flag; a near-unique
    key distribution leaves it off."""
    hot = spark.range(500).select(F.lit(1).alias("ctx"), F.col("id").alias("e"))
    info = self_join_size(hot, "ctx")
    assert info["explosion"] is True
    assert info["est_pairs"] >= 500 * 499 / 2
    assert info["max_key_frac"] >= 1.0  # one key holds everything
    flat = spark.range(500).select(F.col("id").alias("ctx"), F.col("id").alias("e"))
    info = self_join_size(flat, "ctx")
    assert info["explosion"] is False
    # one-sided: grid collisions (birthday, ~n²/2w per depth) inflate
    # the zero true pair count slightly, but never near the threshold
    assert info["est_pairs"] <= 0.1 * info["n_rows"]


def test_explain_join_self_mode_cli(spark, tmp_path):  # noqa: F811
    import contextlib
    import io
    import json

    import pytest as _pytest

    from yelp_recommender_spark import cli

    hot = str(tmp_path / "hot.parquet")
    spark.range(400).select(
        F.lit(1).cast("long").alias("ctx"), F.col("id").alias("e")
    ).write.parquet(hot)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with _pytest.raises(SystemExit) as e:
            cli.main(
                ["explain-join", "--left", hot, "--on", "ctx", "--self"]
            )
    assert e.value.code == 3  # the whale context is an explosion verdict
    plan = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert plan["est_pairs"] >= 400 * 399 / 2
    assert plan["max_key_frac"] >= 1.0

    # exactly one of --right / --self
    with _pytest.raises(SystemExit) as e:
        cli.main(["explain-join", "--left", hot, "--on", "ctx"])
    assert "exactly one" in str(e.value)
    with _pytest.raises(SystemExit) as e:
        cli.main(
            ["explain-join", "--left", hot, "--right", hot,
             "--on", "ctx", "--self"]
        )
    assert "exactly one" in str(e.value)
