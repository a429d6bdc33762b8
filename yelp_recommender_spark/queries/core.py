"""Core relational queries — scans, filters, joins, aggregates, windows,
set operations (SURVEY.md §2.2-§2.7) over the star-schema tables.

Each query is the Spark-first restatement of a reference operator family;
the docstrings cite which. Scale notes inline: what shuffles, what
broadcasts, what AQE handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.exact_agg import davg, dsum
from yelp_recommender_spark.operators.topk import top_k_global, top_n_per_key
from yelp_recommender_spark.queries.registry import query
from yelp_recommender_spark.sources.tables import load_tables


# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→groupBy→multi-agg (TPC-H Q1 shape; A1/A7/P1).

    Scale: single shuffle on a 2-column low-cardinality key; partial
    (map-side) aggregation collapses each partition to ≤ |groups| rows
    before the exchange — the dominant cost is the parquet scan, which
    prunes to the 7 referenced columns (ReadSchema) and pushes the
    shipdate filter down.
    """
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q02_segment_acctbal_avg",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def q02_segment_acctbal_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-average (A1 — the reference's user/business mean-stars shape,
    ``/root/reference/models/content_based_model.py:354-378``)."""
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    return cust.groupBy("c_mktsegment").agg(
        davg("c_acctbal").alias("avg_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# --------------------------------------------------------------------------
@query(
    "q03_top_parts_by_price",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 25
    """,
)
def q03_top_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K (W1/O1/O3). Planned as TakeOrderedAndProject — per-
    partition top-k then a k·P driver merge, never a full sort."""
    part = load_tables(spark, sf_dir, ["part"])["part"]
    return top_k_global(
        part.select("p_partkey", "p_name", "p_retailprice"),
        "p_retailprice",
        25,
        tiebreak="p_partkey",
    )


# --------------------------------------------------------------------------
@query(
    "q04_top_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 5
    """,
)
def q04_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-N via row_number window (W2 — the reference's sorted
    neighbor truncation, ``/root/reference/models/item_cf_model.py:309-313``).

    Scale: customer is the dimension side → broadcast join (no shuffle of
    orders on custkey); the window shuffles once on the 5-value segment
    key — low cardinality, but each partition only keeps N rows per key.
    """
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    joined = t["orders"].join(
        F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return top_n_per_key(
        joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        ["c_mktsegment"],
        "o_totalprice",
        5,
        tiebreak="o_orderkey",
    )


# --------------------------------------------------------------------------
@query(
    "q05_customer_ltv",
    oracle="""
    SELECT c_custkey,
           COALESCE(o.total, 0.0) AS lifetime_value,
           COALESCE(o.n_orders, 0) AS n_orders
    FROM customer
    LEFT JOIN (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    """,
)
def q05_customer_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + default fill (J9/P8 — the cold-start ``coalesce`` chain,
    ``/root/reference/scripts/als_recommender.py:130``)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = t["orders"].groupBy("o_custkey").agg(
        dsum("o_totalprice").alias("total"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        t["customer"]
        .select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("total"), F.lit(0.0)).alias("lifetime_value"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q06_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (T3 — replaces the reference's driver-side set difference,
    ``/root/reference/scripts/als_recommender.py:110-115``)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
@query(
    "q07_customer_order_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_active
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q07_customer_order_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS) + aggregate."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# --------------------------------------------------------------------------
@query(
    "q08_distinct_flag_status",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q08_distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (T4) — hash aggregate with map-side partials."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
@query(
    "q09_nation_pairs_same_region",
    oracle="""
    SELECT a.n_regionkey AS region, a.n_name AS nation1, b.n_name AS nation2
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def q09_nation_pairs_same_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta self-join with ordered-pair dedup (J1/P6 — the reference's
    cartesian + ``x[0] < x[1]``, ``/root/reference/models/item_cf_model.py:78``).
    The equi-key (region) keeps it a hash join, not a cartesian."""
    nation = load_tables(spark, sf_dir, ["nation"])["nation"]
    a, b = nation.alias("a"), nation.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_regionkey").alias("region"),
        F.col("a.n_name").alias("nation1"),
        F.col("b.n_name").alias("nation2"),
    )


# --------------------------------------------------------------------------
@query(
    "q10_supplier_part_overlap",
    oracle="""
    WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, COUNT(*) AS common_parts
    FROM sp a JOIN sp b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY a.l_suppkey, b.l_suppkey
    HAVING COUNT(*) >= 3
    """,
)
def q10_supplier_part_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection join (J4/T2/P4 — co-rated sets,
    ``/root/reference/models/item_cf_model.py:79-82``).

    Expressed relationally (explode → self-equi-join on the shared element
    → groupBy pair): this is the scale-correct form — the join key is the
    element, so Spark distributes by part rather than materializing per-id
    sets, and the ``HAVING`` prunes pairs before they leave the aggregate.
    """
    from yelp_recommender_spark.cache import register_persist

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    # pinned: the self-join below references sp twice, and each raw
    # reference re-runs the distinct over the full lineitem scan (the
    # r10 plan audit showed 2 scans + 2 distinct aggregates); one
    # materialization feeds both sides (released by clear_caches() at
    # the pipeline boundary — the corated_weights convention)
    sp = register_persist(li.select("l_suppkey", "l_partkey").distinct())
    a, b = sp.alias("a"), sp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(F.col("a.l_suppkey").alias("s1"), F.col("b.l_suppkey").alias("s2"))
        .agg(F.count(F.lit(1)).alias("common_parts"))
        .filter(F.col("common_parts") >= 3)
    )


# --------------------------------------------------------------------------
@query(
    "q11_revenue_per_nation",
    oracle="""
    SELECT n_name AS nation,
           CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q11_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star query (J2/J3). Scale: orders/customer/nation are all
    dimension-sized relative to lineitem → broadcast the chain so lineitem
    never shuffles before the final low-cardinality aggregate. (At true
    TPC-H scale orders is fact-sized: AQE would pick sort-merge there; the
    explicit hints stay correct because Catalyst ignores impossible ones.)
    """
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["orders"].select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
@query(
    "q12_order_priority_matrix",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q12_order_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key count/sum matrix (A7)."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    return orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


# --------------------------------------------------------------------------
@query(
    "q13_brand_weighted_price",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST((l_quantity * l_extendedprice) AS DECIMAL(27,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS weighted_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q13_brand_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average Σw·x/Σw (A9 — the CF weighted scorer shape,
    ``/root/reference/models/item_cf_model.py:356-366``). part is a
    broadcast dimension."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            (
                dsum(F.col("l_quantity") * F.col("l_extendedprice"))
                / dsum("l_quantity")
            ).alias("weighted_price")
        )
    )


# --------------------------------------------------------------------------
@query(
    "q14_symmetrized_pairs",
    oracle="""
    WITH pairs AS (
        SELECT a.n_nationkey AS id1, b.n_nationkey AS id2
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    )
    SELECT id1, id2 FROM pairs
    UNION ALL
    SELECT id2 AS id1, id1 AS id2 FROM pairs
    """,
)
def q14_symmetrized_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-based edge symmetrization (J7 — undirected CF weights expanded
    to both directions, ``/root/reference/scripts/predict_user_cf.py:175-185``)."""
    nation = load_tables(spark, sf_dir, ["nation"])["nation"]
    a, b = nation.alias("a"), nation.alias("b")
    pairs = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").alias("id1"), F.col("b.n_nationkey").alias("id2")
    )
    return pairs.union(pairs.select(F.col("id2").alias("id1"), F.col("id1").alias("id2")))


# --------------------------------------------------------------------------
@query(
    "q15_running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM orders
    """,
)
def q15_running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit frame (beyond-reference window surface;
    the decimal accumulator keeps the cumulative values engine-exact)."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


# --------------------------------------------------------------------------
@query(
    "q71_salted_segment_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(o_totalprice) AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q71_salted_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics per market segment computed through the EXPLICIT
    skew-handling path (`operators/skew.py`): the orders→customer join is
    salted (hot custkeys spread over 8 reducers) and the aggregation runs
    two-stage over a salt in [0, 16) — the plan a 100-TB pipeline needs
    when one whale key would otherwise own a reducer. The oracle is the
    plain join+group-by: salting must be invisible in the result,
    including the exact-decimal sums (the partial stage keeps DECIMAL)."""
    from yelp_recommender_spark.operators.skew import (
        salted_aggregate,
        salted_join,
    )

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    dim = t["customer"].select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(
        t["orders"].select("o_custkey", "o_totalprice"), dim,
        on="o_custkey", n_salts=8,
    )
    return salted_aggregate(
        joined,
        ["c_mktsegment"],
        {
            "n_orders": ("*", "count"),
            "total_price": ("o_totalprice", "dsum"),
            "avg_price": ("o_totalprice", "avg"),
        },
        n_salts=16,
    )


# --------------------------------------------------------------------------
# q81: the SQL SURFACE itself. One query string, two engines — the Spark
# side registers the parquet tables as temp views and executes the SAME
# text through spark.sql (parser → Catalyst → the identical physical
# shapes the DataFrame catalog produces), and that text doubles as the
# DuckDB oracle. Revenue uses the exact DECIMAL accumulator so the shared
# string is also hash-deterministic.
_Q81_SQL = """
    SELECT o.o_orderkey,
           o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
    GROUP BY o.o_orderkey, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
"""


@query("q81_sql_shipping_priority", oracle=_Q81_SQL)
def q81_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped top-revenue orders executed through ``spark.sql``
    over temp views — gates the engine's SQL entry point end-to-end with
    a query string shared verbatim with the oracle.

    Scale: Catalyst plans this identically to the DataFrame form —
    customer (filtered, small) broadcasts into orders, the orders⋈lineitem
    join shuffles on the uniform orderkey, aggregation is partial-final,
    and the ORDER BY+LIMIT becomes TakeOrderedAndProject (no global
    sort)."""
    tables = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return spark.sql(_Q81_SQL)


# --------------------------------------------------------------------------
@query(
    "q84_bloom_semijoin",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    )
    """,
)
def q84_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join of orders against high-balance customers through the
    bloom-filter reduction (``operators/bloom.py``): the fact side is
    pruned map-side by n_hashes broadcast word-table lookups BEFORE the
    exact semi-join that guarantees correctness — the bloom changes
    cost, never the result, which is why a plain ``WHERE IN`` oracle
    gates it exactly.

    Scale: for a key side too big to broadcast as an exact hash set
    (~10 bits/key vs 64+ for the set), the shuffle that remains moves
    only true matches + ~1% false positives instead of the whole fact
    table. Spark's runtime bloom filtering applies the same idea
    automatically only under specific join shapes; this operator makes
    it explicit and reusable (the word table is a persistable
    DataFrame)."""
    from yelp_recommender_spark.operators.bloom import bloom_semi_join

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    rich = t["customer"].filter(F.col("c_acctbal") > 5000.0)
    return bloom_semi_join(
        t["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        rich.select("c_custkey"),
        big_key="o_custkey",
        small_key="c_custkey",
        m_bits=1 << 14,
    )


# --------------------------------------------------------------------------
@query(
    "q90_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, o_totalprice FROM orders
    ),
    new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 11 != 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice
        FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice
    FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice != n.o_totalprice
    """,
)
def q90_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconciliation between two snapshot versions: the "new"
    snapshot derives deterministically from orders (every 11th key
    deleted, every 5th repriced, every 13th re-added under a shifted
    key) and the diff classifies added/removed/changed with old+new
    values — the CDC-backfill / pipeline-regression check, and the
    catalog's one FULL OUTER join.

    Scale: one full-outer shuffle on the key; unchanged keys (the bulk)
    are dropped row-locally, so output ∝ change volume."""
    from yelp_recommender_spark.operators.diff import snapshot_diff

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    old = orders.select("o_orderkey", "o_totalprice")
    # one orders scan for the synthetic "new" snapshot (r10 scan audit:
    # the 2-branch union planned one scan per branch) — each row emits
    # its applicable snapshot fates through one explode; a %13 key not
    # divisible by 11 contributes both rows, exactly as the union did
    k = F.col("o_orderkey")
    fates = F.array(
        F.when(
            k % 11 != 0,
            F.struct(
                k.alias("o_orderkey"),
                F.when(k % 5 == 0, F.col("o_totalprice") + 1.0)
                .otherwise(F.col("o_totalprice"))
                .alias("o_totalprice"),
            ),
        ),
        F.when(
            k % 13 == 0,
            F.struct(
                (k + 10000000).alias("o_orderkey"),
                F.col("o_totalprice").alias("o_totalprice"),
            ),
        ),
    )
    new = (
        orders.select(F.explode(fates).alias("_n"))
        .filter(F.col("_n").isNotNull())
        .select("_n.*")
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice"])


# --------------------------------------------------------------------------
@query(
    "q91_scd2_merge",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST(0 AS BIGINT) AS valid_from,
               CAST(NULL AS BIGINT) AS valid_to
        FROM customer
    ),
    upd AS (
        SELECT c_custkey, c_mktsegment,
               c_acctbal + 100.0 AS c_acctbal
        FROM customer WHERE c_custkey % 4 = 0
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer WHERE c_custkey % 4 = 1
        UNION ALL
        SELECT c_custkey + 100000, 'NEWSEG', 0.0
        FROM customer WHERE c_custkey % 9 = 0
    ),
    changed AS (
        SELECT d.*, u.c_mktsegment AS u_seg, u.c_acctbal AS u_bal,
               (u.c_custkey IS NOT NULL
                AND (d.c_mktsegment IS DISTINCT FROM u.c_mktsegment
                     OR d.c_acctbal IS DISTINCT FROM u.c_acctbal)) AS chg
        FROM dim d LEFT JOIN upd u USING (c_custkey)
    )
    SELECT c_custkey, c_mktsegment, c_acctbal, valid_from, valid_to
    FROM changed WHERE NOT chg
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal, valid_from,
           CAST(1000 AS BIGINT)
    FROM changed WHERE chg
    UNION ALL
    SELECT c_custkey, u_seg, u_bal, CAST(1000 AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM changed WHERE chg
    UNION ALL
    SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
           CAST(1000 AS BIGINT), CAST(NULL AS BIGINT)
    FROM upd u LEFT JOIN dim d USING (c_custkey)
    WHERE d.c_custkey IS NULL
    """,
)
def q91_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension merge: customers as a versioned dimension (all
    rows current at t=0) receive a batch at t=1000 — every 4th key
    repriced (+100 → close + reopen), every (4k+1)th key re-sent
    unchanged (pass through untouched), and new NEWSEG keys open their
    first row. Output: the complete next history snapshot, gated
    value-for-value against a pure-SQL MERGE expansion.

    Scale: the merge joins only CURRENT rows against the batch; closed
    history passes through untouched — cost O(current + batch), not
    O(history)."""
    from yelp_recommender_spark.operators.scd import scd2_merge

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    # one customer scan for the whole batch feed (r10 scan audit: the
    # 3-branch union planned one scan per branch) — each row emits its
    # applicable update fates through one explode; branches can overlap
    # (a %4==0 key divisible by 9 contributes two rows, exactly as the
    # union did), and non-matching slots explode away as NULLs
    k = F.col("c_custkey")
    fates = F.array(
        F.when(
            k % 4 == 0,
            F.struct(
                k.alias("c_custkey"),
                F.col("c_mktsegment").alias("c_mktsegment"),
                (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            ),
        ),
        F.when(
            k % 4 == 1,
            F.struct(
                k.alias("c_custkey"),
                F.col("c_mktsegment").alias("c_mktsegment"),
                F.col("c_acctbal").alias("c_acctbal"),
            ),
        ),
        F.when(
            k % 9 == 0,
            F.struct(
                (k + 100000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
            ),
        ),
    )
    updates = (
        cust.select(F.explode(fates).alias("_u"))
        .filter(F.col("_u").isNotNull())
        .select("_u.*")
    )
    return scd2_merge(
        dim,
        updates,
        ["c_custkey"],
        ["c_mktsegment", "c_acctbal"],
        batch_ts=1000,
    )


# --------------------------------------------------------------------------
@query(
    "q93_lineitem_unpivot",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS amount FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS amount FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS amount FROM w
    """,
)
def q93_lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): per-flag metric sums melted to
    ``(l_returnflag, metric, amount)`` via ``DataFrame.unpivot`` — the
    inverse of q92's pivot, and the normalization step that feeds
    metric-keyed sinks (dashboards, long-form ML feature stores).

    Scale: ``unpivot`` is a row-local generator (each input row emits
    one row per value column — an ``expand`` node, no shuffle, no UDF);
    the only shuffle is the upstream aggregation's. The wide input here
    is already tiny (one row per flag), which is the realistic shape:
    melt AFTER aggregating, never the raw fact table."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return wide.unpivot(
        "l_returnflag", ["sum_qty", "sum_price", "sum_disc"], "metric", "amount"
    )
