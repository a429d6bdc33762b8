"""Sketch-backed join planner (`operators/joinplan.py`): estimate
exactness on collision-free fixtures, strategy choice per evidence
(broadcast / salted / shuffle), the explosion warning, the
results-identical-whichever-path contract, and the escalation rule
(broadcast decisions never scan the left side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)

from yelp_recommender_spark.operators.joinplan import join_plan, planned_join


def _uniform(spark, n, n_keys, key="k"):
    return spark.range(n).select(
        (F.col("id") % n_keys).cast("long").alias(key),
        F.col("id").alias("payload"),
    )


def test_estimate_exact_without_collisions(spark):  # noqa: F811
    # 200 distinct keys on each side, width 8192 >> 200: no grid
    # collisions, so the min-over-depths inner product IS the exact
    # join output count
    a = _uniform(spark, 1_000, 200)  # 5 rows per key
    b = _uniform(spark, 600, 200)  # 3 rows per key
    plan = join_plan(a, b, "k", broadcast_rows=10)
    exact = a.join(b, "k").count()  # 200 keys * 5 * 3 = 3000
    assert exact == 3_000
    assert plan["est_join_rows"] == float(exact)
    assert plan["n_left"] == 1_000 and plan["n_right"] == 600
    # 3000 out of 1600 input rows: close to explosion_factor default
    assert plan["amplification"] == 3_000 / 1_600


def test_broadcast_decision_never_scans_left(spark):  # noqa: F811
    # right side under the threshold: decided at step 1, the left
    # grid is never built (n_left stays None — the observable proof)
    a = _uniform(spark, 5_000, 500)
    b = _uniform(spark, 100, 100)
    plan = join_plan(a, b, "k", broadcast_rows=1_000)
    assert plan["strategy"] == "broadcast"
    assert plan["n_left"] is None and plan["est_join_rows"] is None
    assert plan["n_right"] == 100


def test_whale_key_flips_plan_to_salted(spark):  # noqa: F811
    # left side: half the rows on ONE key, rest unique → salted;
    # uniform left → shuffle. Same right side both times.
    whale = spark.range(10_000).select(
        F.when(F.col("id") < 5_000, F.lit(7))
        .otherwise(F.col("id") + 1_000_000)
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )
    uniform = _uniform(spark, 10_000, 5_000)
    right = _uniform(spark, 3_000, 3_000, key="k")
    p_whale = join_plan(whale, right, "k", broadcast_rows=1_000)
    p_uni = join_plan(uniform, right, "k", broadcast_rows=1_000)
    assert p_whale["strategy"] == "salted"
    assert p_whale["max_key_frac_left"] >= 0.5
    assert p_uni["strategy"] == "shuffle"
    # same whale but a right side too big to replicate (> 8x the
    # broadcast threshold): shuffle + AQE skew split, never salted
    p_big_right = join_plan(whale, right, "k", broadcast_rows=100)
    assert p_big_right["strategy"] == "shuffle"
    # the bound is one-sided: collisions only raise it, so the uniform
    # side's reported max-frac is small but nonzero
    assert p_uni["max_key_frac_left"] < 0.05


def test_explosion_warning_on_many_to_many(spark):  # noqa: F811
    # 10 keys × 1000 rows each side → 10M output from 20k input
    a = _uniform(spark, 10_000, 10)
    b = _uniform(spark, 10_000, 10)
    plan = join_plan(a, b, "k", broadcast_rows=100)
    assert plan["explosion"] is True
    assert plan["est_join_rows"] >= 10_000_000.0  # one-sided
    # a filter-shaped join does not warn
    lean = join_plan(
        _uniform(spark, 10_000, 10_000),
        _uniform(spark, 5_000, 5_000),
        "k",
        broadcast_rows=100,
    )
    assert lean["explosion"] is False


def test_planned_join_identical_results_every_strategy(spark):  # noqa: F811
    whale = spark.range(2_000).select(
        F.when(F.col("id") < 1_000, F.lit(3))
        .otherwise(F.col("id") + 50_000)
        .cast("long")
        .alias("k"),
        F.col("id").alias("lp"),
    )
    right = _uniform(spark, 500, 250, key="k").withColumnRenamed(
        "payload", "rp"
    )
    expected = sorted(
        tuple(r) for r in whale.join(right, "k").collect()
    )
    # right side is 250 distinct rows: broadcast under a 1000-row
    # threshold, salted-eligible under 100 (250 <= 8x100), shuffle
    # when the whale dial is out of reach
    cases = (
        {"broadcast_rows": 1_000},  # broadcast
        {"broadcast_rows": 100, "whale_frac": 0.2},  # salted
        {"broadcast_rows": 100, "whale_frac": 0.99},  # shuffle
    )
    for kw in cases:
        out = {}
        got = planned_join(
            whale, right, "k", decision_out=out, **kw
        )
        assert sorted(tuple(r) for r in got.collect()) == expected, out
    # the three thresholds above really exercised three strategies
    strategies = [
        join_plan(whale, right, "k", **kw)["strategy"] for kw in cases
    ]
    assert strategies == ["broadcast", "salted", "shuffle"]


def test_planned_join_semi_and_composite_keys(spark):  # noqa: F811
    a = spark.range(1_000).select(
        (F.col("id") % 20).alias("k1"),
        (F.col("id") % 7).alias("k2"),
        F.col("id").alias("payload"),
    )
    b = spark.range(300).select(
        (F.col("id") % 10).alias("k1"),
        (F.col("id") % 7).alias("k2"),
    ).distinct()
    expected = a.join(b, ["k1", "k2"], "left_semi").count()
    out = {}
    got = planned_join(
        a, b, ["k1", "k2"], how="left_semi",
        decision_out=out, broadcast_rows=5,
    )
    assert got.count() == expected
    assert out["strategy"] in ("shuffle", "salted")
    # null key components never match — planner and join agree
    an = a.unionByName(
        spark.createDataFrame([(None, None, 9_999)], a.schema)
    )
    plan = join_plan(an, b, ["k1", "k2"], broadcast_rows=5)
    assert plan["n_left"] == 1_000


def test_explain_join_cli(spark, tmp_path):  # noqa: F811
    import contextlib
    import io
    import json

    import pytest

    from yelp_recommender_spark import cli

    left = str(tmp_path / "left.parquet")
    right = str(tmp_path / "right.parquet")
    _uniform(spark, 10_000, 10).write.parquet(left)
    _uniform(spark, 10_000, 10).write.parquet(right)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as e:
            cli.main(
                [
                    "explain-join",
                    "--left", left, "--right", right,
                    "--on", "k",
                    "--broadcast-rows", "100",
                ]
            )
    assert e.value.code == 3  # explosion verdict, skew-check-style exit
    plan = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert plan["explosion"] is True
    assert plan["est_join_rows"] >= 10_000_000.0

    # a broadcast-shaped pair exits cleanly
    small = str(tmp_path / "small.parquet")
    _uniform(spark, 50, 50).write.parquet(small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(
            ["explain-join", "--left", left, "--right", small, "--on", "k"]
        )
    plan = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert plan["strategy"] == "broadcast" and plan["explosion"] is False


def test_estimate_is_one_sided_property(spark):  # noqa: F811
    """Hypothesis sweep of random key multisets: the CMS estimate is
    NEVER below the true join size (one-sided — collisions only add),
    and planned_join equals the plain join row-for-row whatever
    strategy the random thresholds pick."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys_st = st.lists(st.integers(0, 12), min_size=1, max_size=24)

    @given(keys_st, keys_st, st.sampled_from([0, 5, 1_000]))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(lk, rk, broadcast_rows):
        a = spark.createDataFrame([(k,) for k in lk], "k long")
        b = spark.createDataFrame([(k,) for k in rk], "k long")
        ca, cb = Counter(lk), Counter(rk)
        true_size = sum(ca[k] * cb[k] for k in ca)
        plan = join_plan(a, b, "k", broadcast_rows=broadcast_rows)
        if plan["est_join_rows"] is not None:
            assert plan["est_join_rows"] >= float(true_size)
        got = planned_join(a, b, "k", plan=plan).count()
        assert got == true_size

    prop()


def test_planned_join_broadcast_plans_broadcast_hash_join(spark):  # noqa: F811
    """Plan pin: the 'broadcast' strategy must MATERIALIZE as a
    BroadcastHashJoin (the hint survives to the physical plan), and the
    'shuffle' strategy on the same frames must not broadcast-hint —
    leaving Catalyst/AQE free to pick from stats."""
    a = _uniform(spark, 5_000, 500)
    b = _uniform(spark, 200, 200).withColumnRenamed("payload", "rp")
    plan = lambda df: df._jdf.queryExecution().executedPlan().toString()  # noqa: E731

    out = {}
    bcast = planned_join(a, b, "k", decision_out=out, broadcast_rows=1_000)
    assert out["strategy"] == "broadcast"
    assert "BroadcastHashJoin" in plan(bcast)

    out = {}
    shuffled = planned_join(
        a, b, "k", decision_out=out, broadcast_rows=10, whale_frac=0.99
    )
    assert out["strategy"] == "shuffle"
    # identical rows either way (the planner only changes the shape)
    assert sorted(map(tuple, bcast.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_hot_small_right_side_still_carries_explosion_evidence(spark):  # noqa: F811
    """A right side under the broadcast threshold whose keys REPEAT
    must not ride the cheap short-circuit: broadcast stays the physical
    shape, but the planner escalates to the grid estimate so the
    explosion flag carries evidence (100 rows of one key can multiply
    the join 100x)."""
    left = _uniform(spark, 10_000, 10)  # 1000 rows per key
    hot_right = spark.range(100).select(
        F.lit(7).cast("long").alias("k"), F.col("id").alias("rp")
    )
    plan = join_plan(left, hot_right, "k", broadcast_rows=1_000)
    assert plan["strategy"] == "broadcast"
    assert plan["right_max_multiplicity"] == 100
    assert plan["explosion"] is True
    assert plan["est_join_rows"] >= 100_000.0  # 1000 left x 100 right
    # unique-keyed right side of the same size: short-circuit, no
    # left scan, no explosion possible beyond the factor
    flat_right = _uniform(spark, 100, 100).withColumnRenamed("payload", "rp")
    plan = join_plan(left, flat_right, "k", broadcast_rows=1_000)
    assert plan["strategy"] == "broadcast"
    assert plan["n_left"] is None and plan["explosion"] is False
