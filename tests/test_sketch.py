"""Mergeable sketch state (`operators/sketch.py`): the merge property
itself (state(A ∪ B) == merge(state(A), state(B)) — exact for the
linear sketches, estimate-identical for HLL/KMV), the published error
bounds, signed-delta retraction for the linear sketches, parameter
mismatch guards, and the map-only probe plan for count-min lookups.
The merge property is the whole point: it is what lets a standing
summary refresh per ingest batch in O(|batch|) instead of rescanning
accumulated facts (the non-distributive tail `incr_agg.py` cannot
cover)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


# --------------------------------------------------------------------
# HLL distinct count
# --------------------------------------------------------------------


def _hll_feed(spark, lo, hi):  # noqa: F811
    # key k sees distinct items lo..hi-1 thinned by (item % (k+1) == 0)
    return (
        spark.range(lo, hi)
        .select(
            (F.col("id") % 7).alias("k"),
            F.concat(F.lit("item-"), F.col("id")).alias("item"),
        )
    )


def test_hll_estimates_close_to_exact(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        hll_estimate,
        hll_state,
    )

    df = _hll_feed(spark, 0, 70_000)
    got = {
        r.k: r.dv_item
        for r in hll_estimate(
            hll_state(df, ["k"], ["item"], lg_k=12), ["item"]
        ).collect()
    }
    exact = {
        r.k: r.dv
        for r in df.groupBy("k")
        .agg(F.countDistinct("item").alias("dv"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, dv in exact.items():
        # 1.04/sqrt(2^12) ~ 1.6% one-sigma; allow 5%
        assert abs(got[k] - dv) / dv < 0.05


def test_hll_merge_equals_whole_and_is_layout_independent(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_state,
    )

    a, b = _hll_feed(spark, 0, 40_000), _hll_feed(spark, 30_000, 70_000)
    whole = hll_state(a.unionByName(b), ["k"], ["item"])
    merged = hll_merge(
        hll_state(a, ["k"], ["item"]),
        hll_state(b.repartition(13), ["k"], ["item"]),
        ["k"],
        ["item"],
    )
    ew = {r.k: r.dv_item for r in hll_estimate(whole, ["item"]).collect()}
    em = {r.k: r.dv_item for r in hll_estimate(merged, ["item"]).collect()}
    # register union is exact set semantics, but DataSketches serves a
    # direct build from the HIP estimator and a unioned sketch from the
    # composite estimator — the two NUMBERS agree within the bound, not
    # bit-for-bit
    assert set(ew) == set(em)
    for k in ew:
        assert abs(em[k] - ew[k]) / ew[k] < 0.05
    # and the merge itself is layout-independent: same inputs split the
    # same way, different partitioning → identical merged estimates
    em2 = {
        r.k: r.dv_item
        for r in hll_estimate(
            hll_merge(
                hll_state(a.repartition(5), ["k"], ["item"]),
                hll_state(b, ["k"], ["item"]),
                ["k"],
                ["item"],
            ),
            ["item"],
        ).collect()
    }
    assert em == em2


def test_hll_incremental_loop_matches_rescan(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_state,
    )

    batches = [
        _hll_feed(spark, lo, lo + 10_000) for lo in (0, 10_000, 20_000)
    ]
    standing = hll_state(batches[0], ["k"], ["item"])
    for batch in batches[1:]:
        standing = hll_merge(
            standing, hll_state(batch, ["k"], ["item"]), ["k"], ["item"]
        )
    rescan = hll_state(
        batches[0].unionByName(batches[1]).unionByName(batches[2]),
        ["k"],
        ["item"],
    )
    es = {r.k: r.dv_item for r in hll_estimate(standing, ["item"]).collect()}
    er = {r.k: r.dv_item for r in hll_estimate(rescan, ["item"]).collect()}
    assert set(es) == set(er)
    for k in er:  # HIP vs composite estimator: close, not bit-equal
        assert abs(es[k] - er[k]) / er[k] < 0.05


# --------------------------------------------------------------------
# Count-min frequency sketch
# --------------------------------------------------------------------


def _zipf_items(spark, n_rows=20_000, n_items=200):  # noqa: F811
    # item i appears ~ n_rows/(i+1) times (heavy head, long tail)
    return spark.range(n_rows).select(
        F.concat(
            F.lit("w-"),
            F.floor(
                F.pow(
                    F.lit(float(n_items)),
                    F.pmod(F.xxhash64("id"), 10_000).cast("double")
                    / 10_000.0,
                )
            )
            - 1,
        ).alias("item")
    )


def test_cms_one_sided_and_within_bound(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        cms_lookup,
        cms_state,
    )

    df = _zipf_items(spark)
    state = cms_state(df, "item", depth=5, width=2048)
    exact = df.groupBy("item").agg(F.count("*").alias("true_n"))
    probed = cms_lookup(state, exact, "item").collect()
    n_total = df.count()
    eps_n = (2.718281828 / 2048) * n_total  # ~27 at 20k rows
    for r in probed:
        assert r.est_n >= r.true_n  # never under-counts (structural)
        assert r.est_n <= r.true_n + eps_n * 3  # generous 3x slack


def test_cms_merge_is_exact_and_signed_deltas_retract(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        cms_merge,
        cms_state,
    )

    def rows(state):
        return sorted(
            (r.d, r.pos, r.n) for r in state.collect() if r.n != 0
        )

    a = _zipf_items(spark, 8_000)
    b = _zipf_items(spark, 6_000).select(
        F.concat(F.lit("x"), "item").alias("item")
    )
    whole = cms_state(a.unionByName(b), "item", depth=4, width=512)
    merged = cms_merge(
        cms_state(a, "item", depth=4, width=512),
        cms_state(b.repartition(7), "item", depth=4, width=512),
    )
    # linear sketch: the merged COUNTER TABLE is row-identical, not
    # just estimate-close
    assert rows(whole) == rows(merged)

    # signed retraction: insert A∪B, retract B → the state of A alone
    retract_b = b.withColumn("w", F.lit(-1))
    retracted = cms_merge(
        whole, cms_state(retract_b, "item", depth=4, width=512, weight_col="w")
    )
    assert rows(retracted) == rows(cms_state(a, "item", depth=4, width=512))


def test_cms_shape_mismatch_raises_and_null_item_is_null(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        cms_lookup,
        cms_merge,
        cms_state,
    )

    df = spark.range(100).select(F.col("id").cast("string").alias("item"))
    s1 = cms_state(df, "item", depth=3, width=64)
    s2 = cms_state(df, "item", depth=3, width=128)
    with pytest.raises(ValueError, match="different shapes"):
        cms_merge(s1, s2)

    probe = spark.createDataFrame(
        [("5",), (None,)], "item string"
    )
    got = {r.item: r.est_n for r in cms_lookup(s1, probe, "item").collect()}
    assert got["5"] >= 1
    assert got[None] is None


def test_cms_lookup_plan_is_map_side(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        cms_lookup,
        cms_state,
    )

    df = spark.range(1000).select(F.col("id").cast("string").alias("item"))
    state = cms_state(df, "item", depth=4, width=256)
    probed = cms_lookup(state, df, "item")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the probe side meets the counter grid only through broadcasts:
    # the probed table itself is never shuffled or sort-merge joined
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") == 4


# --------------------------------------------------------------------
# KMV bottom-k distinct sample
# --------------------------------------------------------------------


def test_kmv_exact_below_k_and_estimate_above(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        kmv_estimate,
        kmv_state,
    )

    # key 0: 30 distinct items (< k, exact); key 1: 20000 (estimated)
    small = spark.range(30).select(
        F.lit(0).alias("k"), F.concat(F.lit("s"), "id").alias("item")
    )
    big = spark.range(20_000).select(
        F.lit(1).alias("k"), F.concat(F.lit("b"), "id").alias("item")
    )
    # multiplicity must not matter: duplicate the feeds
    feed = small.unionByName(big).unionByName(small).unionByName(big)
    est = {
        r.k: r.dv_est
        for r in kmv_estimate(kmv_state(feed, ["k"], "item", k=256)).collect()
    }
    assert est[0] == 30.0  # below k: the sample IS the distinct set
    assert abs(est[1] - 20_000) / 20_000 < 0.15  # ~1/sqrt(256) ≈ 6%


def test_kmv_merge_equals_whole_build(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        kmv_merge,
        kmv_state,
    )

    a = spark.range(5_000).select(
        (F.col("id") % 3).alias("k"),
        F.concat(F.lit("i"), "id").alias("item"),
    )
    b = spark.range(3_000, 9_000).select(
        (F.col("id") % 3).alias("k"),
        F.concat(F.lit("i"), "id").alias("item"),
    )
    whole = kmv_state(a.unionByName(b), ["k"], "item", k=64)
    merged = kmv_merge(
        kmv_state(a, ["k"], "item", k=64),
        kmv_state(b.repartition(11), ["k"], "item", k=64),
        ["k"],
    )
    got_w = {r.k: [(e.h, e.item) for e in r.kmv] for r in whole.collect()}
    got_m = {r.k: [(e.h, e.item) for e in r.kmv] for r in merged.collect()}
    # bottom-k of a union == bottom-k of the two bottom-k's: the merged
    # STATE is identical element-for-element (overlap included)
    assert got_w == got_m


def test_kmv_k_mismatch_raises(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        kmv_merge,
        kmv_state,
    )

    df = spark.range(100).select(
        F.lit(0).alias("k"), F.col("id").cast("string").alias("item")
    )
    with pytest.raises(ValueError, match="different k"):
        kmv_merge(
            kmv_state(df, ["k"], "item", k=16),
            kmv_state(df, ["k"], "item", k=32),
            ["k"],
        )


# --------------------------------------------------------------------
# Log-binned histogram quantiles
# --------------------------------------------------------------------


def test_hist_quantiles_within_relative_bound(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        hist_quantiles,
        hist_state,
    )

    df = spark.range(1, 10_001).select(
        (F.col("id") % 2).alias("k"), F.col("id").cast("double").alias("v")
    )
    state = hist_state(df, ["k"], "v", bins_per_octave=16)
    got = {
        r.k: (r.q_0_5, r.q_0_99)
        for r in hist_quantiles(state, [0.5, 0.99]).collect()
    }
    exact = {
        r.k: (r.m, r.p99)
        for r in df.groupBy("k")
        .agg(
            F.expr("percentile(v, 0.5)").alias("m"),
            F.expr("percentile(v, 0.99)").alias("p99"),
        )
        .collect()
    }
    bound = 2 ** (1.0 / (2 * 16)) * 1.01  # discretization + rank-step slack
    for k in exact:
        for got_v, true_v in zip(got[k], exact[k]):
            assert true_v / bound <= got_v <= true_v * bound


def test_hist_zeros_merge_and_signed_retraction(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        hist_merge,
        hist_quantiles,
        hist_state,
    )

    def rows(state):
        return sorted((r.k, r.bin, r.n) for r in state.collect())

    zeros = spark.range(50).select(F.lit(0).alias("k"), F.lit(0.0).alias("v"))
    ones = spark.range(10).select(F.lit(0).alias("k"), F.lit(8.0).alias("v"))
    state = hist_state(zeros.unionByName(ones), ["k"], "v")
    q = hist_quantiles(state, [0.5, 0.95]).collect()[0]
    assert q.q_0_5 == 0.0  # median sits in the zero bin
    assert q.q_0_95 == pytest.approx(8.0, rel=0.03)

    # merge equals whole-build, and a signed retraction of `ones`
    # returns exactly the zeros-only state table
    merged = hist_merge(
        hist_state(zeros, ["k"], "v"), hist_state(ones, ["k"], "v")
    )
    assert rows(merged) == rows(state)
    retracted = hist_merge(
        state,
        hist_state(
            ones.withColumn("w", F.lit(-1)), ["k"], "v", weight_col="w"
        ),
    )
    assert rows(retracted) == rows(hist_state(zeros, ["k"], "v"))


def test_hist_negative_values_and_bpo_mismatch(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        hist_merge,
        hist_quantiles,
        hist_state,
    )

    # symmetric signed values: -5000..5000 without zero, plus one zero
    df = (
        spark.range(1, 5_001)
        .select(F.col("id").cast("double").alias("v"))
        .select(F.explode(F.array(F.col("v"), -F.col("v"))).alias("v"))
        .unionByName(spark.createDataFrame([(0.0,)], "v double"))
        .select(F.lit(0).alias("k"), "v")
    )
    state = hist_state(df, ["k"], "v", bins_per_octave=16)
    got = hist_quantiles(state, [0.25, 0.5, 0.75]).collect()[0]
    bound = 2 ** (1.0 / 32) * 1.01
    # bin order is value order: the quartiles land at ±2500-ish and the
    # median at the zero sentinel exactly
    assert -2500 * bound <= got.q_0_25 <= -2500 / bound
    assert got.q_0_5 == 0.0
    assert 2500 / bound <= got.q_0_75 <= 2500 * bound

    ok = spark.createDataFrame([(0, 1.0)], "k int, v double")
    with pytest.raises(ValueError, match="bins_per_octave"):
        hist_merge(
            hist_state(ok, ["k"], "v", bins_per_octave=8),
            hist_state(ok, ["k"], "v", bins_per_octave=16),
        )


# --------------------------------------------------------------------
# Measured growth (the test_scale_sweep_r8 treatment): all four sketch
# builds over the documents token stream, sf0.01 → sf0.1 (10× docs).
# Sketch state is FIXED-SIZE per key, so build cost must track the
# input linearly — a superlinear reading means a sketch is secretly
# materializing per-item state.
# --------------------------------------------------------------------


def _sketch_pass(spark, sf_dir):  # noqa: F811
    import os
    import time

    from yelp_recommender_spark.functions.text import tokens_col
    from yelp_recommender_spark.operators.sketch import (
        cms_state,
        hist_state,
        hll_state,
        kmv_state,
        mg_state,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "source", tokens_col("text").alias("toks"))
    tokens = docs.select(
        "source", F.explode("toks").alias("token")
    )
    lengths = docs.select("source", F.size("toks").cast("double").alias("v"))
    start = time.perf_counter()
    hll_state(tokens, ["source"], ["token"]).count()
    cms_state(tokens, "token").count()
    kmv_state(tokens, ["source"], "token", k=256).count()
    hist_state(lengths, ["source"], "v").count()
    mg_state(tokens, ["source"], "token", k=64).count()
    return time.perf_counter() - start


def test_sketch_builds_grow_linearish_first_decade(spark):  # noqa: F811
    _sketch_pass(spark, "/root/testdata/sf0.001")  # warm-up
    small = _sketch_pass(spark, "/root/testdata/sf0.01")
    big = _sketch_pass(spark, "/root/testdata/sf0.1")
    ratio = big / max(small, 0.5)
    print(f"sketch build growth: {small:.2f}s -> {big:.2f}s ({ratio:.1f}x)")
    if ratio >= 25.0:  # stall re-measure: min-of-2, the bench rationale
        small = min(small, _sketch_pass(spark, "/root/testdata/sf0.01"))
        big = min(big, _sketch_pass(spark, "/root/testdata/sf0.1"))
        ratio = big / max(small, 0.5)
    assert ratio < 25.0, f"superlinear sketch build growth: {ratio:.1f}x"


# --------------------------------------------------------------------
# Misra-Gries heavy hitters
# --------------------------------------------------------------------


def _mg_feed():
    """(key, item) rows: key 0 skewed with a 40% heavy item plus a
    long tail; key 1 uniform (12 items x 3, defeats every counter at
    k=4 so only the sentinel survives)."""
    rows = []
    rows += [(0, "hot")] * 80
    rows += [(0, f"warm{i}") for i in range(8) for _ in range(10)]
    rows += [(0, f"cold{i}") for i in range(40)]
    rows += [(1, f"u{i}") for i in range(12) for _ in range(3)]
    return rows


def _exact(rows):
    from collections import Counter

    by_key = {}
    for k, it in rows:
        by_key.setdefault(k, Counter())[it] += 1
    return by_key


def _check_bounds(state_rows, exact):
    """The three Misra-Gries guarantees against exact counts."""
    by_key = {}
    for r in state_rows:
        by_key.setdefault(r.k, []).append(r)
    for k, rs in by_key.items():
        delta = rs[0].mg_delta
        total = rs[0].mg_n
        assert all(r.mg_delta == delta and r.mg_n == total for r in rs)
        assert total == sum(exact[k].values())
        kk = rs[0].mg_k
        assert delta <= total / (kk + 1)  # the frequent-elements bound
        summarized = {r.item for r in rs if r.item is not None}
        for r in rs:
            if r.item is not None:
                assert r.n_lo <= exact[k][r.item] <= r.n_lo + delta
        for item, c in exact[k].items():
            if item not in summarized:
                assert c <= delta  # absent => light
            if c > total / (kk + 1):
                assert item in summarized  # heavy => present


def test_mg_bounds_heavy_guarantee_and_sentinel(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        mg_heavy_hitters,
        mg_state,
    )

    rows = _mg_feed()
    df = spark.createDataFrame(rows, "k int, item string")
    state = mg_state(df, ["k"], "item", k=4)
    collected = state.collect()
    _check_bounds(collected, _exact(rows))
    # key 1 is uniform: every counter dies in the compress, but the
    # sentinel keeps its error budget alive
    key1 = [r for r in collected if r.k == 1]
    assert [r.item for r in key1] == [None]
    assert key1[0].mg_delta == 3 and key1[0].mg_n == 36
    hh = mg_heavy_hitters(state, min_frac=0.3).collect()
    assert [(r.k, r.item) for r in hh] == [(0, "hot")]
    assert hh[0].n_lo <= 80 <= hh[0].n_hi


def test_mg_merge_preserves_guarantees(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import mg_merge, mg_state

    rows = _mg_feed()
    # interleaved split so both halves see both keys
    a_rows = rows[0::2]
    b_rows = rows[1::2]
    a = mg_state(
        spark.createDataFrame(a_rows, "k int, item string"), ["k"],
        "item", k=4,
    )
    b = mg_state(
        spark.createDataFrame(b_rows, "k int, item string").repartition(7),
        ["k"], "item", k=4,
    )
    merged = mg_merge(a, b, ["k"])
    _check_bounds(merged.collect(), _exact(rows))
    # the 40% heavy item survives the merge (true freq >> 1/(k+1))
    assert "hot" in {r.item for r in merged.collect() if r.k == 0}


def test_mg_guards(spark):  # noqa: F811
    import pytest as _pytest

    from yelp_recommender_spark.operators.sketch import mg_merge, mg_state

    df = spark.createDataFrame(
        [(0, "a", 1), (0, "b", -2)], "k int, item string, w int"
    )
    with _pytest.raises(Exception, match="insert-only"):
        mg_state(df, ["k"], "item", k=4, weight_col="w").collect()
    ok = spark.createDataFrame([(0, "a")], "k int, item string")
    with _pytest.raises(ValueError, match="different k"):
        mg_merge(
            mg_state(ok, ["k"], "item", k=4),
            mg_state(ok, ["k"], "item", k=8),
            ["k"],
        )


def test_mg_composes_with_streaming_summary_discipline(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import mg_merge, mg_state
    from yelp_recommender_spark.streaming.ops import (
        latest_summary,
        summary_apply_batch,
    )

    rows = _mg_feed()
    build = lambda b: mg_state(b, ["k"], "item", k=4)  # noqa: E731
    merge = lambda p, s: mg_merge(p, s, ["k"])  # noqa: E731
    state = str(tmp_path / "mg_state")
    third = len(rows) // 3
    for i, chunk in enumerate(
        (rows[:third], rows[third : 2 * third], rows[2 * third :])
    ):
        summary_apply_batch(
            state,
            spark.createDataFrame(chunk, "k int, item string"),
            i,
            build,
            merge,
        )
    _check_bounds(
        latest_summary(spark, state).collect(), _exact(rows)
    )


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_SWEEP_SF1"),
    reason="second-decade sweep is opt-in (amplifies ~170 MB, runs "
    "minutes); set SPARK_GRAFT_SWEEP_SF1=1",
)
def test_sketch_and_profile_second_decade(spark):  # noqa: F811
    import os
    import time

    from yelp_recommender_spark.amplify import amplify
    from yelp_recommender_spark.operators.profile import profile_table

    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scale_data", "sf1"),
    )
    amplify("/root/testdata/sf0.1", sf1_dir, 10)  # idempotent

    def profile_pass(sf_dir):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        start = time.perf_counter()
        prof = profile_table(docs, topk=5)
        for d in prof.values():
            d.count()
        return time.perf_counter() - start

    def sketch_pass(sf_dir):
        return _sketch_pass(spark, sf_dir)

    _sketch_pass(spark, "/root/testdata/sf0.01")  # warm-up
    results = {}
    for name, fn in (("sketch", sketch_pass), ("profile", profile_pass)):
        small = fn("/root/testdata/sf0.1")
        big = fn(sf1_dir)
        ratio = big / max(small, 0.5)
        results[name] = (round(small, 2), round(big, 2), round(ratio, 1))
        if ratio >= 25.0:  # stall re-measure, min-of-2
            small = min(small, fn("/root/testdata/sf0.1"))
            big = min(big, fn(sf1_dir))
            ratio = big / max(small, 0.5)
            results[name] = (round(small, 2), round(big, 2), round(ratio, 1))
        assert ratio < 25.0, f"superlinear {name} growth: {results[name]}"
    print("second-decade sketch/profile growth:", results)


def test_hist_handles_nan_and_infinities(spark):  # noqa: F811
    import math

    from yelp_recommender_spark.operators.sketch import (
        hist_merge,
        hist_quantiles,
        hist_state,
    )

    inf = float("inf")
    df = spark.createDataFrame(
        [(0, -inf), (0, -4.0), (0, 0.0), (0, 2.0), (0, inf),
         (0, float("nan")), (0, None)],
        "k int, v double",
    )
    state = hist_state(df, ["k"], "v")
    # six non-null values in Spark's sort order:
    # -Inf, -4, 0, 2, +Inf, NaN (NaN greatest, matching ORDER BY)
    q = hist_quantiles(
        state, [0.1, 0.33, 0.5, 0.66, 0.81, 0.99]
    ).collect()[0]
    assert q.q_0_1 == -inf
    assert -4.1 < q.q_0_33 < -3.9
    assert q.q_0_5 == 0.0
    assert 1.9 < q.q_0_66 < 2.1
    assert q.q_0_81 == inf
    assert math.isnan(q.q_0_99)
    # special bins merge like any other bin (linear sketch)
    merged = hist_merge(state, hist_state(df, ["k"], "v"))
    rows = {r.bin: r.n for r in merged.collect()}
    assert set(rows) == {r.bin for r in state.collect()}
    assert all(n == 2 for n in rows.values())


def test_mg_rollup_preserves_guarantees(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        mg_rollup,
        mg_state,
    )

    rows = _mg_feed()
    # partials per hash bucket (an extra leading key), rolled up global
    df = spark.createDataFrame(rows, "k int, item string").withColumn(
        "b", F.pmod(F.xxhash64("item"), F.lit(4))
    )
    partial = mg_state(df, ["b", "k"], "item", k=4)
    rolled = mg_rollup(partial, ["k"])
    _check_bounds(rolled.collect(), _exact(rows))
    assert "hot" in {r.item for r in rolled.collect() if r.k == 0}
    # no-op rollup: keys unchanged returns the state as-is
    assert mg_rollup(partial, ["b", "k"]).columns == partial.columns


def test_detect_skew_finds_planted_whale(spark):  # noqa: F811
    from yelp_recommender_spark.operators.skew import detect_skew

    n = 40_000
    # user 7 owns 30% of events; everyone else is uniform noise
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(7))
        .otherwise(F.pmod(F.xxhash64("id"), 5_000) + 100)
        .alias("user_id")
    )
    got = detect_skew(df, ["user_id"], min_frac=0.05, k=64)
    rows = got.collect()
    assert [r.user_id for r in rows] == [7]
    r = rows[0]
    assert r.n_lo <= 12_000 <= r.n_hi
    assert r.n_total == n
    assert r.frac_lo <= 0.3 <= r.frac_hi
    # guarantee margin: 0.05 + 1/65 ~ 0.065 << 0.3
    assert r.frac_lo >= 0.05

    uniform = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), 5_000)).alias("user_id")
    )
    assert detect_skew(uniform, ["user_id"], min_frac=0.05, k=64).count() == 0


def test_cms_join_size_estimate(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        cms_join_size,
        cms_merge,
        cms_state,
    )

    # zipf-ish keys on both sides: the true join size is dominated by
    # hot-key cross products — exactly what the estimator must catch
    a = _zipf_items(spark, 6_000, 50)
    b = _zipf_items(spark, 4_000, 50)
    true_n = a.join(b, "item").count()
    est = cms_join_size(
        cms_state(a, "item", depth=5, width=4096),
        cms_state(b, "item", depth=5, width=4096),
    ).collect()[0].est_join_rows
    assert est >= true_n  # one-sided, like the point queries
    # eps*Na*Nb = (e/4096)*24M ~ 1.6% of 24M; generous 3x slack
    assert est <= true_n + 3 * (2.718281828 / 4096) * 6_000 * 4_000

    # disjoint key spaces: estimate collapses toward zero (only hash
    # collisions contribute)
    disjoint = b.select(F.concat(F.lit("zzz"), "item").alias("item"))
    est0 = cms_join_size(
        cms_state(a, "item", depth=5, width=4096),
        cms_state(disjoint, "item", depth=5, width=4096),
    ).collect()[0].est_join_rows
    assert est0 <= 3 * (2.718281828 / 4096) * 6_000 * 4_000

    import pytest as _pytest

    with _pytest.raises(ValueError, match="different shapes"):
        cms_join_size(
            cms_state(a, "item", depth=3, width=64),
            cms_state(b, "item", depth=3, width=128),
        )
    # and it composes with merge: the estimate over merged batch grids
    # equals the estimate over the whole-feed grid (linearity);
    # deterministic id split so both halves are stable across jobs
    with_id = spark.range(6_000).select(
        "id",
        F.concat(
            F.lit("w-"),
            F.floor(
                F.pow(
                    F.lit(50.0),
                    F.pmod(F.xxhash64("id"), 10_000).cast("double")
                    / 10_000.0,
                )
            )
            - 1,
        ).alias("item"),
    )
    merged = cms_merge(
        cms_state(
            with_id.where("id < 3000"), "item", depth=5, width=4096
        ),
        cms_state(
            with_id.where("id >= 3000"), "item", depth=5, width=4096
        ),
    )
    est_m = cms_join_size(
        merged, cms_state(b, "item", depth=5, width=4096)
    ).collect()[0].est_join_rows
    assert est_m == est


def test_mg_rollup_of_empty_state_is_empty(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import mg_rollup, mg_state

    empty = mg_state(
        spark.createDataFrame([], "b int, k int, item string"),
        ["b", "k"],
        "item",
        k=4,
    )
    # empty-in -> empty-out, even for the GLOBAL rollup whose meta agg
    # would otherwise emit one all-NULL row
    assert mg_rollup(empty, ["k"]).count() == 0
    assert mg_rollup(empty, []).count() == 0


def test_detect_skew_handles_hostile_key_names(spark):  # noqa: F811
    from yelp_recommender_spark.operators.skew import detect_skew

    df = spark.range(2_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), 500) + 10)
        .alias("user.id"),  # dotted flat name: F.col would mis-parse it
        F.lit("x").alias("seg`ment"),
    )
    got = detect_skew(df, ["user.id", "seg`ment"], min_frac=0.1, k=32)
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0]["user.id"] == 1 and rows[0]["seg`ment"] == "x"
    assert rows[0].frac_lo <= 0.5 <= rows[0].frac_hi


def test_cms_join_size_survives_whale_products_past_long_range(spark):  # noqa: F811
    from yelp_recommender_spark.operators.sketch import (
        cms_join_size,
        cms_state,
    )

    # one key weighted 4e9 on each side: the true join size 1.6e19
    # exceeds Long.MAX — the estimate must come back as that magnitude,
    # not an overflow error or a wrapped negative
    w = 4_000_000_000
    one = spark.createDataFrame([("hot", w)], "item string, w long")
    est = cms_join_size(
        cms_state(one, "item", depth=3, width=64, weight_col="w"),
        cms_state(one, "item", depth=3, width=64, weight_col="w"),
    ).collect()[0].est_join_rows
    assert est == float(w) * float(w)


def test_skew_check_cli(spark, tmp_path):  # noqa: F811
    import contextlib
    import io
    import json as _json

    import pytest as _pytest

    from yelp_recommender_spark.cli import main

    skewed = str(tmp_path / "skewed.parquet")
    spark.range(10_000).select(
        F.when(F.col("id") % 4 == 0, F.lit(42))
        .otherwise(F.pmod(F.xxhash64("id"), 3_000) + 100)
        .alias("user_id")
    ).write.parquet(skewed)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with _pytest.raises(SystemExit) as exc:
            main(
                [
                    "skew-check", "--input", skewed,
                    "--keys", "user_id", "--min-frac", "0.05",
                ]
            )
    assert exc.value.code == 3  # whales found -> gateable nonzero exit
    report = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["n_whales"] == 1
    assert report["whales"][0]["user_id"] == "42"
    assert report["whales"][0]["frac_lo"] <= 0.25 <= report["whales"][0]["frac_hi"]

    uniform = str(tmp_path / "uniform.parquet")
    spark.range(10_000).select(
        F.pmod(F.xxhash64("id"), 3_000).alias("user_id")
    ).write.parquet(uniform)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(
            [
                "skew-check", "--input", uniform,
                "--keys", "user_id", "--min-frac", "0.05",
            ]
        )  # clean exit: no whales
    assert _json.loads(buf.getvalue().strip().splitlines()[-1])[
        "n_whales"
    ] == 0


def test_skew_check_from_profile_matches_scan(spark, tmp_path):  # noqa: F811
    """r9 (VERDICT r8 #6): skew-check --from-profile answers from the
    standing profile's written heavy-hitters view — no table scan — and
    must reach the IDENTICAL whale verdict (same keys, same exit code)
    as the scan path on the same table; refusals (exit 2) cover every
    case the view cannot guarantee."""
    import contextlib
    import io
    import json as _json

    import pytest as _pytest

    from yelp_recommender_spark.cli import main

    skewed = str(tmp_path / "skewed.parquet")
    spark.range(10_000).select(
        F.when(F.col("id") % 4 == 0, F.lit(42))
        .otherwise(F.pmod(F.xxhash64("id"), 3_000) + 100)
        .alias("user_id")
    ).write.parquet(skewed)
    prof = str(tmp_path / "prof")
    with contextlib.redirect_stdout(io.StringIO()):
        main(["profile", "--input", skewed, "--output", prof])

    def run(argv):
        buf = io.StringIO()
        code = 0
        with contextlib.redirect_stdout(buf):
            try:
                main(argv)
            except SystemExit as e:
                code = e.code
        return code, _json.loads(buf.getvalue().strip().splitlines()[-1])

    scan_code, scan = run(
        ["skew-check", "--input", skewed, "--keys", "user_id",
         "--min-frac", "0.05"]
    )
    prof_code, from_prof = run(
        ["skew-check", "--from-profile", prof, "--keys", "user_id",
         "--min-frac", "0.05"]
    )
    assert scan_code == prof_code == 3
    assert from_prof["source"] == "profile"
    assert {w["user_id"] for w in scan["whales"]} == {
        w["user_id"] for w in from_prof["whales"]
    } == {"42"}
    w = from_prof["whales"][0]
    assert w["frac_lo"] <= 0.25 <= w["frac_hi"]

    # refusals: threshold below the summary's resolution (profile
    # default mg_k=64 -> 1/65 ~ 0.0154), composite keys, missing column
    code, rep = run(
        ["skew-check", "--from-profile", prof, "--keys", "user_id",
         "--min-frac", "0.01"]
    )
    assert code == 2 and "resolution" in rep["err"]
    with _pytest.raises(SystemExit) as e:
        main(["skew-check", "--from-profile", prof,
              "--keys", "a,b", "--min-frac", "0.05"])
    assert "single key" in str(e.value)
    code, rep = run(
        ["skew-check", "--from-profile", prof, "--keys", "nope",
         "--min-frac", "0.05"]
    )
    assert code == 2 and "not in profile" in rep["err"]
    # exactly one of --input / --from-profile
    with _pytest.raises(SystemExit) as e:
        main(["skew-check", "--keys", "user_id"])
    assert "exactly one" in str(e.value)

    # uniform table: clean exit from the profile too
    uniform = str(tmp_path / "uniform.parquet")
    spark.range(10_000).select(
        F.pmod(F.xxhash64("id"), 20).alias("user_id")
    ).write.parquet(uniform)
    prof_u = str(tmp_path / "prof_u")
    with contextlib.redirect_stdout(io.StringIO()):
        main(["profile", "--input", uniform, "--output", prof_u])
    code, rep = run(
        ["skew-check", "--from-profile", prof_u, "--keys", "user_id",
         "--min-frac", "0.2"]
    )
    assert code == 0 and rep["n_whales"] == 0


def test_skew_check_from_profile_complete_view_answers(spark, tmp_path):  # noqa: F811
    """r10 (ADVICE r9 #2): the heavy-hitters view stores its own top-k
    quota, so a list SHORTER than the quota is provably COMPLETE (the
    MG summary held fewer survivors) and all-clear no longer refuses;
    a list AT quota with every row clearing min_frac still does, and a
    profile predating the stored topk stays conservative."""
    import contextlib
    import io
    import json as _json

    from yelp_recommender_spark.cli import main

    def run(argv):
        buf = io.StringIO()
        code = 0
        with contextlib.redirect_stdout(buf):
            try:
                main(argv)
            except SystemExit as e:
                code = e.code
        return code, _json.loads(buf.getvalue().strip().splitlines()[-1])

    # 5 keys x 20% each: every stored row clears min_frac=0.1, but the
    # list (5) is under the view's quota (10) -> complete, answer
    five = str(tmp_path / "five.parquet")
    spark.range(10_000).select(
        F.pmod(F.col("id"), 5).alias("user_id")
    ).write.parquet(five)
    prof5 = str(tmp_path / "prof5")
    with contextlib.redirect_stdout(io.StringIO()):
        main(["profile", "--input", five, "--output", prof5])
    scan_code, scan = run(
        ["skew-check", "--input", five, "--keys", "user_id",
         "--min-frac", "0.1"]
    )
    prof_code, rep = run(
        ["skew-check", "--from-profile", prof5, "--keys", "user_id",
         "--min-frac", "0.1"]
    )
    assert scan_code == prof_code == 3
    assert {w["user_id"] for w in rep["whales"]} == {
        w["user_id"] for w in scan["whales"]
    } == {"0", "1", "2", "3", "4"}

    # same table, profile with the topk column stripped (pre-r10
    # layout): the reader cannot rule out truncation -> refuse
    old = str(tmp_path / "prof5_old")
    hh_dir = f"{prof5}/heavy_hitters"
    hh = spark.read.parquet(hh_dir)
    import shutil

    shutil.copytree(prof5, old)
    shutil.rmtree(f"{old}/heavy_hitters")
    hh.drop("topk").write.parquet(f"{old}/heavy_hitters")
    code, rep = run(
        ["skew-check", "--from-profile", old, "--keys", "user_id",
         "--min-frac", "0.1"]
    )
    assert code == 2 and "truncated" in rep["err"]

    # 15 keys x ~6.7% each with quota 10: stored list is AT quota and
    # all clear min_frac=0.05 -> whales could be cut off, refuse
    fifteen = str(tmp_path / "fifteen.parquet")
    spark.range(15_000).select(
        F.pmod(F.col("id"), 15).alias("user_id")
    ).write.parquet(fifteen)
    prof15 = str(tmp_path / "prof15")
    with contextlib.redirect_stdout(io.StringIO()):
        main(["profile", "--input", fifteen, "--output", prof15])
    code, rep = run(
        ["skew-check", "--from-profile", prof15, "--keys", "user_id",
         "--min-frac", "0.05"]
    )
    assert code == 2 and "truncated" in rep["err"]
