"""Dual-surface coherence: every oracle SQL string that PARSES on Spark
SQL must produce the same canonical rows as the query's DataFrame
implementation. The oracles are written for DuckDB; a large portable
core (pure-ANSI aggregates, windows, CUBE, joins, even the unrolled
PageRank CTE chain) happens to be valid Spark SQL too — so the engine's
SQL entry point and its DataFrame surface are pinned to agree wherever
both can express the query."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)

# Known-portable set as of round 4 — portability regressions (an oracle
# rewritten into DuckDB-only SQL, or a Spark-SQL semantic drift) fail
# loudly. New portable entries should be ADDED here.
PORTABLE = [
    "q01_pricing_summary", "q02_segment_acctbal_avg",
    "q03_top_parts_by_price", "q04_top_orders_per_segment",
    "q05_customer_ltv", "q06_customers_without_orders",
    "q07_customer_order_segments", "q08_distinct_flag_status",
    "q09_nation_pairs_same_region", "q10_supplier_part_overlap",
    "q11_revenue_per_nation", "q12_order_priority_matrix",
    "q13_brand_weighted_price", "q14_symmetrized_pairs",
    "q15_running_total_per_customer", "q19_events_dedup_exact",
    "q50_baseline_predict", "q51_item_cf_weights",
    "q52_item_cf_predict", "q53_user_cf_predict", "q54_baseline_rmse",
    "q58_extended_content_predict", "q71_salted_segment_stats",
    "q79_stream_static_enrich", "q80_sketch_distinct",
    "q81_sql_shipping_priority", "q84_bloom_semijoin",
    "q90_snapshot_diff", "q91_scd2_merge", "q92_event_type_pivot",
    "q93_lineitem_unpivot", "q95_small_quantity_revenue",
    "q96_dominant_suppliers", "q100_cube_revenue",
    "q101_fuzzy_part_names", "q104_frequent_items_gate",
    "q105_incremental_agg", "q109_pagerank", "q110_window_family",
    "q115_quality_report", "q119_stats_family",
]


@pytest.fixture(scope="module")
def views(spark):  # noqa: F811
    from yelp_recommender_spark.sources.tables import load_tables

    for t, df in load_tables(spark, SF_DIR).items():
        df.createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark_and_matches(views, name):
    from tests.oracle_harness import canonical_rows

    import yelp_recommender_spark.queries as Q

    spark = views
    sdf = spark.sql(Q.ORACLES[name])
    srows = canonical_rows(
        list(sdf.columns), [tuple(r) for r in sdf.collect()]
    )
    qdf = Q.QUERIES[name](spark, SF_DIR)
    qrows = canonical_rows(
        list(qdf.columns), [tuple(r) for r in qdf.collect()]
    )
    assert srows == qrows
