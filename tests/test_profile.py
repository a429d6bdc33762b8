"""One-pass table profiler (`operators/profile.py` + the `profile`
CLI): per-column stats vs exact answers, Misra-Gries value intervals
containing the exact counts, quantiles within the histogram bound on
signed numerics, the one-scan plan pin for the stats pass, and the CLI
round-trip."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)


def test_column_stats_match_exact(spark):  # noqa: F811
    from yelp_recommender_spark.operators.profile import (
        profile_column_stats,
    )

    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    stats = {
        r.column: r for r in profile_column_stats(cust).collect()
    }
    n = cust.count()
    assert set(stats) == set(cust.columns)
    for c in cust.columns:
        exact_nn = cust.where(F.col(c).isNotNull()).count()
        exact_dv = cust.select(c).distinct().count()
        r = stats[c]
        assert r.n_rows == n
        assert r.n_nonnull == exact_nn
        assert abs(r.approx_distinct - exact_dv) <= max(2, 0.05 * exact_dv)
    # min/max are the NATIVE-type extremes rendered as strings — never
    # the lexicographic extremes of the string cast ("100" < "99")
    r = stats["c_acctbal"]
    lo, hi = cust.agg(
        F.min("c_acctbal").cast("string"),
        F.max("c_acctbal").cast("string"),
    ).collect()[0]
    assert (r.min_value, r.max_value) == (lo, hi)
    assert float(r.min_value) < 0 < float(r.max_value)


def test_heavy_hitters_and_quantiles(spark):  # noqa: F811
    from yelp_recommender_spark.operators.profile import profile_table

    li = spark.read.parquet(
        os.path.join(SF_DIR, "lineitem.parquet")
    ).select("l_returnflag", "l_quantity", "l_discount")
    prof = profile_table(li, topk=5)

    hh = [
        r
        for r in prof["heavy_hitters"].collect()
        if r.column == "l_returnflag"
    ]
    exact = {
        r.l_returnflag: r.c
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("c"))
        .collect()
    }
    got = {r.value for r in hh}
    assert got == set(exact)  # 3 flag values, all way above 1/(k+1)
    for r in hh:
        assert r.n_lo <= exact[r.value] <= r.n_hi

    q = {r.column: r for r in prof["quantiles"].collect()}
    assert set(q) == {"l_quantity", "l_discount"}
    bound = 2 ** (1.0 / 32) * 1.02
    for c in q:
        true_med = li.agg(F.expr(f"percentile({c}, 0.5)")).collect()[0][0]
        got_med = q[c].q_0_5
        if true_med == 0:
            assert abs(got_med) < 1e-12
        else:
            assert true_med / bound <= got_med <= true_med * bound


def test_stats_pass_is_one_scan_one_agg_row(spark):  # noqa: F811
    from yelp_recommender_spark.operators.profile import (
        profile_column_stats,
    )

    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    stats = profile_column_stats(cust)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # every counter, one pass
    assert "Sort" not in plan  # never value-sorts the table


def test_profile_cli_round_trip(spark, tmp_path):  # noqa: F811
    import contextlib
    import io

    from yelp_recommender_spark.cli import main

    out = str(tmp_path / "prof")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(
            [
                "profile",
                "--input", os.path.join(SF_DIR, "nation.parquet"),
                "--output", out,
                "--columns", "n_name,n_regionkey",
                "--topk", "3",
            ]
        )
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["n_rows"] == 25
    assert report["columns"]["n_name"]["approx_distinct"] == 25
    assert set(report["columns"]) == {"n_name", "n_regionkey"}
    for part in ("columns", "heavy_hitters", "quantiles"):
        assert os.path.exists(os.path.join(out, part))
    hh = spark.read.parquet(os.path.join(out, "heavy_hitters"))
    assert hh.groupBy("column").count().agg(F.max("count")).collect()[0][
        0
    ] <= 3


def test_column_stats_merge_across_batches(spark):  # noqa: F811
    from yelp_recommender_spark.operators.profile import (
        merge_column_stats,
        profile_column_stats,
    )

    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: F811

    a = spark.range(0, 6_000).select(
        F.col("id").alias("n"),
        (F.col("id") - 3_000).cast("double").alias("v"),
        F.concat(F.lit("s"), F.col("id") % 97).alias("s"),
    )
    b = spark.range(4_000, 10_000).select(
        F.col("id").alias("n"),
        (F.col("id") - 3_000).cast("double").alias("v"),
        F.concat(F.lit("s"), F.col("id") % 97).alias("s"),
    )
    merged = merge_column_stats(
        profile_column_stats(a, keep_sketches=True),
        profile_column_stats(b, keep_sketches=True),
    )
    got = {r.column: r for r in merged.collect()}
    assert got["n"].n_rows == 12_000  # row counts SUM (batch semantics)
    # distinct of the union, not the sum of distincts (overlap 2k rows)
    assert abs(got["n"].approx_distinct - 10_000) / 10_000 < 0.05
    # numeric fold: -3000 beats "-1" lexicographically losing to "-999"
    assert float(got["v"].min_value) == -3000.0
    assert float(got["v"].max_value) == 6999.0
    assert got["s"].min_value == "s0" and got["s"].max_value == "s96"
    # merging estimate-only stats must refuse, not silently mis-merge
    with _pytest.raises(ValueError, match="keep_sketches"):
        merge_column_stats(
            profile_column_stats(a), profile_column_stats(b)
        )


def test_kmv_jaccard_and_intersection(spark):  # noqa: F811
    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: F811

    from yelp_recommender_spark.operators.sketch import (
        kmv_jaccard,
        kmv_state,
    )

    # key 0: |A|=|B|=8000, overlap 4000 -> J = 4000/12000 = 1/3
    # key 1: small sets below k -> exact J = 2/4 = 0.5
    a_rows = spark.range(0, 8_000).select(
        F.lit(0).alias("k"), F.concat(F.lit("i"), "id").alias("item")
    ).unionByName(
        spark.createDataFrame(
            [(1, "x"), (1, "y"), (1, "z")], "k int, item string"
        )
    )
    b_rows = spark.range(4_000, 12_000).select(
        F.lit(0).alias("k"), F.concat(F.lit("i"), "id").alias("item")
    ).unionByName(
        spark.createDataFrame(
            [(1, "y"), (1, "z"), (1, "w")], "k int, item string"
        )
    )
    got = {
        r.k: r
        for r in kmv_jaccard(
            kmv_state(a_rows, ["k"], "item", k=256),
            kmv_state(b_rows, ["k"], "item", k=256),
            ["k"],
        ).collect()
    }
    assert abs(got[0].jaccard_est - 1 / 3) < 0.1  # ~1/sqrt(256) noise
    assert abs(got[0].union_est - 12_000) / 12_000 < 0.15
    assert abs(got[0].intersection_est - 4_000) / 4_000 < 0.35
    assert got[1].jaccard_est == 0.5  # below k: the samples ARE the sets
    assert got[1].union_est == 4.0
    assert got[1].intersection_est == 2.0

    with _pytest.raises(ValueError, match="different k"):
        kmv_jaccard(
            kmv_state(a_rows, ["k"], "item", k=64),
            kmv_state(b_rows, ["k"], "item", k=128),
            ["k"],
        )


def test_merge_matches_whole_build_for_digitlike_strings(spark):  # noqa: F811
    """The value_kind rule: a STRING column of numeric-looking values
    must merge in the same (lexicographic) order its per-batch stats
    were built in — a numeric fold here would make merge-then-read
    disagree with a whole rescan."""
    from yelp_recommender_spark.operators.profile import (
        merge_column_stats,
        profile_column_stats,
    )

    a = spark.createDataFrame([("100",), ("99",)], "s string")
    b = spark.createDataFrame([("98",)], "s string")
    whole = profile_column_stats(a.unionByName(b)).collect()[0]
    merged = merge_column_stats(
        profile_column_stats(a, keep_sketches=True),
        profile_column_stats(b, keep_sketches=True),
    ).collect()[0]
    assert (whole.min_value, whole.max_value) == ("100", "99")
    assert (merged.min_value, merged.max_value) == (
        whole.min_value,
        whole.max_value,
    )
    assert merged.value_kind == "other"


def test_profile_handles_hostile_column_names(spark):  # noqa: F811
    from yelp_recommender_spark.operators.profile import profile_table

    df = spark.range(10).select(
        F.col("id").alias("it's"),
        (F.col("id") % 3).alias("a`b"),
        F.col("id").cast("string").alias("a.b"),
    )
    prof = profile_table(df, topk=2)
    stats = {r.column: r for r in prof["columns"].collect()}
    assert set(stats) == {"it's", "a`b", "a.b"}
    assert stats["it's"].approx_distinct == 10
    assert stats["a`b"].n_nonnull == 10
    hh_cols = {r.column for r in prof["heavy_hitters"].collect()}
    assert hh_cols == {"it's", "a`b", "a.b"}
    q_cols = {r.column for r in prof["quantiles"].collect()}
    assert q_cols == {"it's", "a`b"}  # the string column has no quantiles


def test_profile_cli_standing_state(spark, tmp_path):  # noqa: F811
    import contextlib
    import io

    from yelp_recommender_spark.cli import main

    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    spark.range(0, 800).select(
        F.col("id").alias("user_id")
    ).write.parquet(day1)
    spark.range(500, 1_500).select(
        F.col("id").alias("user_id")
    ).write.parquet(day2)

    reports = []
    for i, src in enumerate((day1, day2)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(
                [
                    "profile",
                    "--input", src,
                    "--output", str(tmp_path / f"out{i}"),
                    "--state", str(tmp_path / "standing"),
                ]
            )
        reports.append(json.loads(buf.getvalue().strip().splitlines()[-1]))
    assert [r["standing_version"] for r in reports] == [0, 1]
    # day 1: 800 rows / 800 distinct; after day 2: 1800 rows, distinct
    # of the UNION (1500, overlap 300) — not the 2600 a naive sum gives
    assert reports[0]["n_rows"] == 800
    assert reports[1]["n_rows"] == 1_800
    dv = reports[1]["columns"]["user_id"]["approx_distinct"]
    assert abs(dv - 1_500) / 1_500 < 0.05


def test_profile_cli_pinned_state_version_is_retry_safe(spark, tmp_path):  # noqa: F811
    import contextlib
    import io

    from yelp_recommender_spark.cli import main

    day1 = str(tmp_path / "d1.parquet")
    spark.range(0, 600).select(F.col("id").alias("u")).write.parquet(day1)

    def run():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(
                [
                    "profile",
                    "--input", day1,
                    "--output", str(tmp_path / "out"),
                    "--state", str(tmp_path / "standing"),
                    "--state-version", "100",
                ]
            )
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    first = run()
    retry = run()  # same pinned version: overwrites, never double-counts
    assert first["standing_version"] == retry["standing_version"] == 100
    assert first["n_rows"] == retry["n_rows"] == 600
    assert (
        retry["columns"]["u"]["approx_distinct"]
        == first["columns"]["u"]["approx_distinct"]
    )


def test_merge_ignores_all_null_side_minmax(spark):  # noqa: F811
    """r9 ADVICE regression: merging a side whose numeric column is
    all-NULL must not NULL out the merged min/max — the fold key is
    guarded on non-null so the aggregate skips the null side exactly
    like F.min/F.max do natively on a whole rescan."""
    from yelp_recommender_spark.operators.profile import (
        merge_column_stats,
        profile_column_stats,
    )

    a = spark.createDataFrame([(5.0,), (7.0,)], "v double")
    b = spark.createDataFrame(
        [(None,), (None,)], "v double"
    )
    sa = profile_column_stats(a, keep_sketches=True)
    sb = profile_column_stats(b, keep_sketches=True)
    for merged_df in (
        merge_column_stats(sa, sb),
        merge_column_stats(sb, sa),  # order-independent
    ):
        r = merged_df.collect()[0]
        assert (r.min_value, r.max_value) == ("5.0", "7.0")
        assert r.n_rows == 4 and r.n_nonnull == 2
    # merge-equals-build: a whole rescan of the union agrees
    whole = profile_column_stats(a.unionByName(b)).collect()[0]
    assert (whole.min_value, whole.max_value) == ("5.0", "7.0")


def test_profile_skips_minmax_on_non_orderable_types(spark):  # noqa: F811
    """r9 ADVICE regression: a MapType column must not fail the whole
    profile — min/max are NULL for it, every orderable column is still
    profiled, and counts/distincts cover the map column too."""
    from yelp_recommender_spark.operators.profile import (
        profile_column_stats,
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2}), (3, None)],
        "id int, m map<string,int>",
    )
    stats = {r.column: r for r in profile_column_stats(df).collect()}
    assert stats["id"].min_value == "1" and stats["id"].max_value == "3"
    assert stats["m"].min_value is None and stats["m"].max_value is None
    assert stats["m"].n_nonnull == 2
    assert stats["m"].approx_distinct == 2
    # profile_table with columns=None (the default-everything path the
    # ADVICE flagged) completes end-to-end
    prof = profile_table(df)
    assert prof["columns"].count() == 2


def test_summary_apply_batch_rejects_keep_last_below_two(spark, tmp_path):  # noqa: F811
    """r9 ADVICE regression: keep_last=1 on the directly-callable step
    would vacuum the replay anchor; the guard now lives on
    summary_apply_batch itself, not only the summary_stream wrapper."""
    import pytest

    from yelp_recommender_spark.operators.sketch import hll_state, hll_merge
    from yelp_recommender_spark.streaming.ops import summary_apply_batch

    b0 = spark.range(0, 10).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )

    def build_fn(df):
        return hll_state(df, ["g"], "v")

    with pytest.raises(ValueError, match="keep_last"):
        summary_apply_batch(
            str(tmp_path / "state"), b0, 0, build_fn, hll_merge,
            keep_last=1,
        )


# ------------------------------------------------------------ drift report
def test_drift_report_pure_checks():
    """Pure-function drift semantics on hand-built profiles: each check
    fires on its planted condition and stays quiet otherwise."""
    from yelp_recommender_spark.operators.profile import drift_report

    base_col = {
        "n_rows": 1_000, "n_nonnull": 1_000, "approx_distinct": 100,
        "min_value": "0.0", "max_value": "10.0", "value_kind": "numeric",
    }
    old = {
        "columns": {"a": dict(base_col), "gone": dict(base_col)},
        "heavy_hitters": {"a": ["x", "y", "z"]},
        "quantiles": {"a": {"q_0_5": 5.0}},
    }
    new = {
        "columns": {
            # null spike + distinct collapse + range break, same column
            "a": {
                "n_rows": 1_000, "n_nonnull": 600, "approx_distinct": 10,
                "min_value": "-50.0", "max_value": "10.0",
                "value_kind": "numeric",
            },
            "added": dict(base_col),
        },
        "heavy_hitters": {"a": ["p", "q", "r"]},  # full turnover
        "quantiles": {"a": {"q_0_5": 50.0}},  # 10x median shift
    }
    by_check = {}
    for f in drift_report(old, new):
        by_check[(f["column"], f["check"])] = f["flagged"]
    assert by_check[("gone", "column_removed")] is True
    assert by_check[("added", "column_added")] is True
    assert by_check[("a", "null_rate")] is True
    assert by_check[("a", "distinct")] is True
    assert by_check[("a", "range")] is True
    assert by_check[("a", "hh_turnover")] is True
    assert by_check[("a", "quantile_q_0_5")] is True
    # identical profiles: nothing flags
    assert not any(f["flagged"] for f in drift_report(old, old))


def test_profile_diff_cli_planted_drift_and_clean_run(spark, tmp_path):  # noqa: F811
    """CLI end-to-end (VERDICT r8 #5): day-1 vs drifted day-2 exits 4
    with the planted findings; day-1 vs statistically-identical day-1b
    exits 0."""
    import contextlib
    import io

    import pytest

    from yelp_recommender_spark.cli import main

    def write_docs(path, n, null_every=0, shift=0.0, extra_col=False):
        v = (F.col("id") % 50).cast("double") + F.lit(shift)
        if null_every:
            v = F.when(F.col("id") % null_every != 0, v)
        cols = [F.col("id").alias("k"), v.alias("v")]
        if extra_col:
            cols.append(F.lit("x").alias("brand_new"))
        spark.range(n).select(*cols).write.parquet(path)

    d1 = str(tmp_path / "day1.parquet")
    d1b = str(tmp_path / "day1b.parquet")
    d2 = str(tmp_path / "day2.parquet")
    write_docs(d1, 2_000)
    write_docs(d1b, 2_000)  # same distribution
    write_docs(d2, 2_000, null_every=3, shift=500.0, extra_col=True)

    outs = {}
    for name, src in (("p1", d1), ("p1b", d1b), ("p2", d2)):
        outs[name] = str(tmp_path / name)
        with contextlib.redirect_stdout(io.StringIO()):
            main(["profile", "--input", src, "--output", outs[name]])

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as e:
            main(["profile-diff", "--old", outs["p1"], "--new", outs["p2"]])
    assert e.value.code == 4
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    checks = {(f["column"], f["check"]) for f in report["flagged"]}
    assert ("brand_new", "column_added") in checks
    assert ("v", "null_rate") in checks
    assert ("v", "range") in checks

    # no drift: clean exit, nothing flagged
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["profile-diff", "--old", outs["p1"], "--new", outs["p1b"]])
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["n_flagged"] == 0


def test_profile_diff_state_versions(spark, tmp_path):  # noqa: F811
    """State-version mode: diff two committed versions of a standing
    profile (defaults to the two newest) — here the second batch adds
    a column and spikes nulls on a shared one, so the cumulative-totals
    diff flags both; version validation exits with a message."""
    import contextlib
    import io

    import pytest

    from yelp_recommender_spark.cli import main

    d1 = str(tmp_path / "b1.parquet")
    d2 = str(tmp_path / "b2.parquet")
    spark.range(1_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 9).cast("double").alias("v"),
    ).write.parquet(d1)
    spark.range(1_000).select(
        (F.col("id") + 10_000).alias("k"),
        F.when(F.col("id") % 2 == 0, (F.col("id") % 9).cast("double"))
        .alias("v"),
        F.lit("x").alias("brand_new"),
    ).write.parquet(d2)

    state = str(tmp_path / "standing")
    for i, src in enumerate((d1, d2)):
        with contextlib.redirect_stdout(io.StringIO()):
            main(
                ["profile", "--input", src,
                 "--output", str(tmp_path / f"out{i}"),
                 "--state", state, "--state-version", str(i)]
            )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as e:
            main(["profile-diff", "--state", state])
    assert e.value.code == 4
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    checks = {(f["column"], f["check"]) for f in report["flagged"]}
    assert ("brand_new", "column_added") in checks
    assert ("v", "null_rate") in checks  # 0 -> 25% cumulative

    # bad version / missing second version are refusals with messages
    with pytest.raises(SystemExit) as e:
        main(["profile-diff", "--state", state,
              "--old-version", "7", "--new-version", "1"])
    assert "not a committed version" in str(e.value)
    with pytest.raises(SystemExit) as e:
        main(["profile-diff", "--state", state, "--old", str(tmp_path)])
    assert "either" in str(e.value)


def test_heavy_hitter_pass_scans_once(spark):  # noqa: F811
    """r9 plan pin: the heavy-hitters pass reads the table ONCE — the
    pre-r9 survivors-UNION-sentinel mg_state referenced its ranked
    aggregation twice, silently doubling the scan the module docstring
    claims is single."""
    from yelp_recommender_spark.operators.profile import profile_table

    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    hh = profile_table(cust, columns=["c_mktsegment", "c_nationkey"])[
        "heavy_hitters"
    ]
    plan = hh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
