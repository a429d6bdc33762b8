"""Advanced relational analytics — decorrelated subqueries, semi-join
chains, range-frame windows, cohort/funnel analytics, CUBE, fuzzy string
dedup, secondary sort, CDC snapshot apply, and a frequent-items sketch
gate.

These extend the catalog past the reference's operator families (the
reference has no window frames, grouping sets, or merge semantics — its
"queries" are fixed RDD pipelines, SURVEY.md §3) with the query shapes a
warehouse user expects from an analytics engine. Every entry is
oracle-checked against DuckDB; float determinism follows the registry
policy (exact DECIMAL partials, IEEE-identical final arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.eventtime import with_ts_us
from yelp_recommender_spark.functions.exact_agg import davg, dsum
from yelp_recommender_spark.queries.registry import query
from yelp_recommender_spark.sources.tables import load_tables

WEEK_US = 604_800_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_ts_us(load_tables(spark, sf_dir, ["events"])["events"])


# --------------------------------------------------------------------------
@query(
    "q95_small_quantity_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           COUNT(*) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
               AS small_rev
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    JOIN part ON p_partkey = l.l_partkey
    WHERE l_quantity < 0.2 * avg_qty
    GROUP BY p_brand
    """,
)
def q95_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape (TPC-H Q17): revenue from
    lineitems whose quantity is below 20% of their part's average — the
    SQL form ``WHERE l_quantity < (SELECT 0.2*avg(l_quantity) ... WHERE
    l2.l_partkey = p_partkey)`` hand-decorrelated into aggregate + join,
    the exact rewrite Catalyst's ``DecorrelateInnerQuery`` performs.

    Scale: the per-part aggregate and the fact-side join shuffle on the
    SAME key (l_partkey), so AQE reuses one exchange for both; the part
    dimension is broadcast. The 0.2*avg threshold is computed from an
    exact decimal sum divided once in IEEE double — bit-identical to the
    oracle, so the boundary comparison cannot diverge.
    """
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li = t["lineitem"]
    pa = li.groupBy("l_partkey").agg(davg("l_quantity").alias("avg_qty"))
    return (
        li.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            dsum("l_extendedprice").alias("small_rev"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q96_dominant_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(27,6))) AS qty
        FROM lineitem GROUP BY l_suppkey, l_partkey
    ),
    pt AS (
        SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(27,6))) AS total
        FROM lineitem GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM sp JOIN pt USING (l_partkey)
        WHERE qty * 2 > total
    )
    """,
)
def q96_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-semi-join chain (TPC-H Q20 shape): suppliers that ship more
    than half of some part's total volume. ``IN (subquery)`` becomes an
    explicit LEFT SEMI join — no duplicate-row inflation, and Spark can
    pick broadcast/shuffled-hash semi strategies under AQE.

    Scale: both aggregates shuffle on keys that PREFIX-share l_partkey
    ((l_suppkey,l_partkey) then l_partkey); the dominance filter runs on
    aggregated rows (≤ |supplier×part| pairs, not lineitems). The
    comparison is pure decimal — exact on both engines.
    """
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    li = t["lineitem"]
    qdec = F.col("l_quantity").cast("decimal(27,6)")
    # Deliberately TWO map-side-partial scans of lineitem rather than
    # persist(sp) + re-aggregation: the r10 interleaved A/B measured the
    # single-scan form SLOWER (2.1-2.4 s → 3.4-3.9 s at sf0.1) — the
    # (supplier, part) partial table is nearly as wide as its input, so
    # materializing it costs more than the column-pruned second scan.
    sp = li.groupBy("l_suppkey", "l_partkey").agg(F.sum(qdec).alias("qty"))
    pt = li.groupBy("l_partkey").agg(F.sum(qdec).alias("total"))
    dominant = (
        sp.join(pt, "l_partkey")
        .filter(F.col("qty") * 2 > F.col("total"))
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            dominant,
            t["supplier"].s_suppkey == dominant.l_suppkey,
            "leftsemi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
@query(
    "q97_moving_revenue_7d",
    oracle="""
    WITH daily AS (
        SELECT l_returnflag,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS INT)
                   AS day,
               SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS rev_dec
        FROM lineitem GROUP BY l_returnflag, day
    )
    SELECT l_returnflag, day,
           CAST(rev_dec AS DOUBLE) AS rev_day,
           CAST(SUM(rev_dec) OVER (
               PARTITION BY l_returnflag ORDER BY day
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_7d
    FROM daily
    """,
)
def q97_moving_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: 7-day moving revenue per return flag. The
    frame is value-based (``rangeBetween(-6, 0)`` over epoch-day), so
    missing days correctly shrink the window — a ROWS frame would be
    wrong whenever dates are sparse.

    Scale: aggregate first (one fine-grained shuffle on (flag, day) with
    full parallelism), THEN window over the tiny per-day aggregate. The
    window's repartition to l_returnflag is a second exchange — but one
    that carries only |flags|·|days| rows, which is the right trade: the
    alternative (pre-partitioning the raw facts by flag so the window
    inherits it) would shuffle the full fact table onto a 3-value key,
    serializing the big shuffle onto 3 reducers. The running sum stays
    DECIMAL through the frame and casts to double once at output.
    """
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    daily = (
        li.withColumn("day", F.expr("unix_date(cast(l_shipdate as date))"))
        .groupBy("l_returnflag", "day")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).alias("rev_dec"))
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "l_returnflag",
        "day",
        F.col("rev_dec").cast("double").alias("rev_day"),
        F.sum("rev_dec").over(w).cast("double").alias("rev_7d"),
    )


# --------------------------------------------------------------------------
@query(
    "q98_cohort_retention",
    oracle=f"""
    WITH wk AS (
        SELECT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events
    ),
    c AS (
        SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
    )
    SELECT cohort_week,
           week - cohort_week AS week_offset,
           COUNT(DISTINCT wk.user_id) AS n_users
    FROM wk JOIN c USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
)
def q98_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: users grouped by first-seen week, counted
    distinct in each subsequent week offset — the standard activation/
    retention triangle.

    Scale: cohort assignment is a groupBy on user_id; the activity join
    is ALSO keyed on user_id, so the cohort aggregate and the join reuse
    one hash partitioning (no broadcast needed — the cohort table is as
    large as the user dimension). The final aggregate shuffles tiny
    (cohort_week, offset) pairs. Week arithmetic is integer epoch-µs —
    engine- and timezone-neutral.
    """
    from yelp_recommender_spark.cache import register_persist

    # wk is the classic diamond: consumed by the cohort aggregate AND
    # as the activity side of the join. Per-branch pushdown keeps the
    # two event scans separate in the executed plan (r10 audit) — pin
    # the thin (user_id, week) projection so the fact is read once
    wk = register_persist(
        _events_us(spark, sf_dir).select(
            "user_id", F.expr(f"ts_us div {WEEK_US}").alias("week")
        )
    )
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
@query(
    "q99_funnel_conversion",
    oracle="""
    WITH f AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view'
                        THEN epoch_us(ts) END) AS t_view,
               MIN(CASE WHEN event_type = 'click'
                        THEN epoch_us(ts) END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
           COUNT(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
           COUNT(CASE WHEN t_view < t_click AND t_click < t_purchase
                      THEN 1 END) AS n_funnel
    FROM f
    """,
)
def q99_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (view → click → purchase): per-user
    first-touch times per stage via conditional MIN, then strict time
    ordering decides stage completion. NULL comparison semantics (a
    missing stage never satisfies ``<``) are identical on both engines.

    Scale: one shuffle on user_id collapsing events to one row per user
    (conditional aggregates are map-side combinable); the funnel count is
    a second, single-row reduction. No event-sequence explosion, no UDF
    — the classic "first-touch funnel as pivoted MIN" formulation.
    """
    ev = _events_us(spark, sf_dir)

    def first_touch(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts_us")))

    f = ev.groupBy("user_id").agg(
        first_touch("view").alias("t_view"),
        first_touch("click").alias("t_click"),
        first_touch("purchase").alias("t_purchase"),
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1)).alias(
            "n_view_click"
        ),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("n_funnel"),
    )


# --------------------------------------------------------------------------
@query(
    "q100_cube_revenue",
    oracle="""
    SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
                ELSE l_returnflag END AS flag,
           CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
                ELSE l_linestatus END AS status,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q100_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all 2^2 grouping sets in one pass) with
    ``grouping()`` flags distinguishing rollup-NULLs from data NULLs —
    the OLAP companion to q67's hierarchical ROLLUP.

    Scale: Spark expands grouping sets BEFORE the exchange (each input
    row emits one row per grouping set, then map-side partial aggregation
    collapses them), so the shuffle still carries at most
    Σ|grouping-set cardinalities| rows — for low-cardinality dimensions
    this is the optimal single-pass plan, no N separate scans.
    """
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(disc_price).alias("revenue"),
        )
        .select(
            # dispatch on the grouping FLAG, not coalesce: a genuine data
            # NULL (grouping = 0) must stay NULL, only the rollup-NULL
            # becomes 'ALL' — mirrors the oracle's CASE WHEN GROUPING(...)
            F.when(F.col("g_flag") == 1, F.lit("ALL"))
            .otherwise(F.col("l_returnflag"))
            .alias("flag"),
            F.when(F.col("g_status") == 1, F.lit("ALL"))
            .otherwise(F.col("l_linestatus"))
            .alias("status"),
            "g_flag",
            "g_status",
            "n_rows",
            "revenue",
        )
    )


# --------------------------------------------------------------------------
@query(
    "q101_fuzzy_part_names",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a
    JOIN names b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def q101_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string dedup (edit distance ≤ 2) over the part-name
    dictionary, blocked on the head noun — the entity-resolution pattern
    for catalog/name tables: dedupe the DISTINCT value dictionary (tiny),
    never the fact rows, then map survivors back by equi-join.

    Scale: ``distinct`` collapses the corpus to the name dictionary
    first; the self-join runs only within blocking buckets (equi-join on
    the block key — hash join, never a cartesian), and ``levenshtein`` is
    a JVM codegen'd builtin evaluated per candidate pair. Block-key
    choice (last token) is the dictionary analog of q31's shingle
    blocking.
    """
    part = load_tables(spark, sf_dir, ["part"])["part"]
    names = (
        part.select("p_name")
        .distinct()
        .withColumn("block", F.split("p_name", " ").getItem(1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn("dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")))
        .filter(F.col("dist") <= 2)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
        )
    )


# --------------------------------------------------------------------------
@query(
    "q102_event_sequences",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS rn
        FROM events
    )
    SELECT user_id,
           STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY rn) AS seq,
           COUNT(*) AS seq_len
    FROM o WHERE rn <= 20 GROUP BY user_id
    """,
)
def q102_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort: each user's first 20 events as an ordered
    event-type-initial string (the session-path / clickstream-sequence
    feature for behavioral models). Order is (ts, event_id) — a total
    order, so the string is deterministic on both engines.

    Scale: row_number caps each user at 20 rows BEFORE any per-group
    collection, so a pathological heavy user costs window-sort time but
    never materializes an unbounded array; the groupBy reuses the
    window's user_id partitioning (no second exchange). The ordered
    concat is array_sort over (rn, initial) structs — JVM-side, no UDF.
    """
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    capped = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 20
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct("rn", F.substring("event_type", 1, 1).alias("c"))
        )
    )
    return capped.groupBy("user_id").agg(
        F.concat_ws(
            "", F.transform(ordered, lambda s: s["c"])
        ).alias("seq"),
        F.count(F.lit(1)).alias("seq_len"),
    )


# --------------------------------------------------------------------------
@query(
    "q103_cdc_apply",
    oracle="""
    WITH ch AS (
        SELECT c_custkey, 'U' AS op, 1 AS seq, c_name, c_nationkey,
               c_acctbal + 50.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, 'D', 2, CAST(NULL AS STRING),
               CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE),
               CAST(NULL AS STRING)
        FROM customer WHERE c_custkey % 5 = 0
        UNION ALL
        SELECT c_custkey + 200000, 'U', 3, 'cdc-insert', 0, 1.0, 'CDCSEG'
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, 'U', 4, c_name, c_nationkey, c_acctbal, 'UPDSEG'
        FROM customer WHERE c_custkey % 5 = 2
    ),
    last AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_custkey ORDER BY seq DESC
        ) AS rn FROM ch
    ),
    l1 AS (SELECT * FROM last WHERE rn = 1),
    j AS (
        SELECT COALESCE(b.c_custkey, l1.c_custkey) AS c_custkey, l1.op,
               CASE WHEN l1.op = 'U' THEN l1.c_name
                    ELSE b.c_name END AS c_name,
               CASE WHEN l1.op = 'U' THEN l1.c_nationkey
                    ELSE b.c_nationkey END AS c_nationkey,
               CASE WHEN l1.op = 'U' THEN l1.c_acctbal
                    ELSE b.c_acctbal END AS c_acctbal,
               CASE WHEN l1.op = 'U' THEN l1.c_mktsegment
                    ELSE b.c_mktsegment END AS c_mktsegment
        FROM customer b FULL JOIN l1 ON b.c_custkey = l1.c_custkey
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM j WHERE op IS NULL OR op <> 'D'
    """,
)
def q103_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot apply (``MERGE INTO`` semantics without a merge-
    capable table format): the customer dimension receives a 4-stage
    change feed — repricing updates (seq 1), deletes (seq 2: keys
    divisible by 15 get update-then-delete, ending deleted), brand-new
    inserted keys (seq 3), and a segment rewrite (seq 4, latest-wins over
    seq-1 updates for keys ≡ 0 mod 3 and ≡ 2 mod 5). Gated value-for-
    value against a pure-SQL latest-wins + full-join expansion.

    Scale: see :func:`yelp_recommender_spark.operators.merge.apply_cdc`
    — O(|base| + |changes|), one window over the feed, one keyed join.
    """
    from yelp_recommender_spark.operators.merge import apply_cdc

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    payload = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

    # one customer scan for the whole 4-stage feed (r10 scan audit: the
    # union planned one scan per stage) — each row emits its applicable
    # change fates through one explode; stages can overlap (a key
    # divisible by 15 gets its seq-1 update AND its seq-2 delete), and
    # non-matching slots explode away as NULLs. The nationkey literals
    # cast to the table's own column type so the struct slots agree.
    k = F.col("c_custkey")
    nk_type = dict(cust.dtypes)["c_nationkey"]

    def fate(keyc, op, seq, name, nat, bal, seg):
        return F.struct(
            keyc.alias("c_custkey"),
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
            name.alias("c_name"),
            nat.alias("c_nationkey"),
            bal.alias("c_acctbal"),
            seg.alias("c_mktsegment"),
        )

    fates = F.array(
        F.when(
            k % 3 == 0,
            fate(
                k, "U", 1, F.col("c_name"), F.col("c_nationkey"),
                F.col("c_acctbal") + 50.0, F.col("c_mktsegment"),
            ),
        ),
        F.when(
            k % 5 == 0,
            fate(
                k, "D", 2, F.lit(None).cast("string"),
                F.lit(None).cast(nk_type), F.lit(None).cast("double"),
                F.lit(None).cast("string"),
            ),
        ),
        F.when(
            k % 7 == 0,
            fate(
                k + 200000, "U", 3, F.lit("cdc-insert"),
                F.lit(0).cast(nk_type), F.lit(1.0), F.lit("CDCSEG"),
            ),
        ),
        F.when(
            k % 5 == 2,
            fate(
                k, "U", 4, F.col("c_name"), F.col("c_nationkey"),
                F.col("c_acctbal"), F.lit("UPDSEG"),
            ),
        ),
    )
    changes = (
        cust.select(F.explode(fates).alias("_c"))
        .filter(F.col("_c").isNotNull())
        .select("_c.*")
    )
    base = cust.select("c_custkey", *payload)
    return apply_cdc(base, changes, ["c_custkey"])


# --------------------------------------------------------------------------
@query(
    "q104_frequent_items_gate",
    oracle="""
    WITH c AS (
        SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT event_type, n, TRUE AS sketch_found
    FROM c, t WHERE n > 0.1 * total
    """,
)
def q104_frequent_items_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters sketch gate (q80's pattern, for frequent items):
    ``df.stat.freqItems`` — Spark's single-pass misra-gries-family
    sketch — must return a SUPERSET of the truly frequent values (that is
    its documented guarantee; false positives allowed, false negatives
    not). The query emits every exactly-frequent value with
    ``sketch_found`` = membership in the sketch result; the oracle pins
    the guarantee by emitting literal TRUE. The exact filter is STRICT
    (count > 10% of rows) because that is the sketch's guarantee
    boundary: an item landing exactly ON support×total may legitimately
    be absent from the sketch (ADVICE r4).

    Scale: the sketch is one map-side pass with bounded state (≤ 1/
    support candidates per partition) merged on the driver — the exact
    count it gates against is the plain two-stage aggregate. Only the
    ≤ 1/support candidate list is ever collected.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    support = 0.1
    sketch_items = set(
        ev.stat.freqItems(["event_type"], support).head()[0]
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total_w = Window.partitionBy()
    return (
        counts.withColumn("total", F.sum("n").over(total_w))
        .filter(F.col("n") > support * F.col("total"))
        .select(
            "event_type",
            "n",
            F.col("event_type")
            .isin(list(sketch_items))
            .alias("sketch_found"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q105_incremental_agg",
    oracle="""
    WITH updated AS (
        SELECT * FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1999-01-01'
          AND NOT (l_returnflag = 'R'
                   AND l_shipdate < TIMESTAMP '1996-01-01')
        UNION ALL
        SELECT * FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01'
          AND l_shipdate < TIMESTAMP '2000-01-01'
    )
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
               AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
               AS sum_price
    FROM updated GROUP BY l_returnflag, l_linestatus
    """,
)
def q105_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: a per-(flag,
    status) COUNT/SUM state built on pre-1999 facts is refreshed by a
    signed delta feed — 1999 fact rows arrive (+1), pre-1996 'R' rows are
    retracted (−1) — WITHOUT rescanning the base facts. The oracle
    recomputes the aggregate from scratch over the updated fact set:
    maintained and recomputed states must be bit-identical, which the
    DECIMAL-exact state makes possible (float state would drift).

    Scale: see :mod:`yelp_recommender_spark.operators.incr_agg` — the
    refresh costs O(|delta| + |affected keys|); at 100 TB the state table
    stays partitioned on its keys and only delta-touched partitions are
    rewritten.
    """
    from yelp_recommender_spark.operators.incr_agg import (
        agg_state,
        merge_deltas,
    )

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    keys = ["l_returnflag", "l_linestatus"]
    sums = ["l_quantity", "l_extendedprice"]
    cut99 = F.to_timestamp(F.lit("1999-01-01"))
    cut96 = F.to_timestamp(F.lit("1996-01-01"))
    cut00 = F.to_timestamp(F.lit("2000-01-01"))
    base = li.filter(F.col("l_shipdate") < cut99)
    state = agg_state(base, keys, sums)
    inserts = li.filter(
        (F.col("l_shipdate") >= cut99) & (F.col("l_shipdate") < cut00)
    ).withColumn("sign", F.lit(1))
    deletes = base.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_shipdate") < cut96)
    ).withColumn("sign", F.lit(-1))
    merged = merge_deltas(
        state, inserts.unionByName(deletes), keys, sums
    )
    return merged.select(
        *keys,
        "n",
        F.col("sum_l_quantity").cast("double").alias("sum_qty"),
        F.col("sum_l_extendedprice").cast("double").alias("sum_price"),
    )


# --------------------------------------------------------------------------
@query(
    "q106_interval_overlap",
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS a_orderkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)
                   AS a_start,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)
                   + 7 AS a_end
        FROM orders WHERE o_orderstatus = 'O' AND o_custkey % 17 = 0
    ),
    b AS (
        SELECT o_orderkey AS b_orderkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)
                   AS b_start,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)
                   + 10 AS b_end
        FROM orders WHERE o_orderstatus = 'F' AND o_custkey % 17 = 0
    )
    SELECT a_orderkey, b_orderkey, a_start, b_start,
           LEAST(a_end, b_end) - GREATEST(a_start, b_start) + 1
               AS overlap_days
    FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
    """,
)
def q106_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join (the symmetric sibling of q66's
    point-in-interval): open-order 8-day windows against finished-order
    11-day windows, every overlapping pair emitted exactly once with its
    overlap length. The oracle is the plain theta join — affordable for
    DuckDB at test scale, a nested-loop disaster at 100 TB, which is the
    point of the bucketized operator.

    Scale: see
    :func:`yelp_recommender_spark.operators.rangejoin.interval_overlap_join`
    — both sides burst to fixed-width buckets, ONE hash equi-join, and
    the first-shared-bucket condition makes emission exactly-once without
    a dedup shuffle over the pair stream.
    """
    from yelp_recommender_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    day = F.expr("unix_date(cast(o_orderdate as date))")
    sub = orders.filter(F.col("o_custkey") % 17 == 0)
    a = sub.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("a_orderkey"),
        day.alias("a_start"),
        (day + 7).alias("a_end"),
    )
    b = sub.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("b_orderkey"),
        day.alias("b_start"),
        (day + 10).alias("b_end"),
    )
    pairs = interval_overlap_join(
        a, b, [], "a_start", "a_end", "b_start", "b_end", bucket_width=16
    )
    return pairs.select(
        "a_orderkey",
        "b_orderkey",
        "a_start",
        "b_start",
        (
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start") + 1
        ).alias("overlap_days"),
    )


# --------------------------------------------------------------------------
HOUR_US = 3_600_000_000


@query(
    "q107_gapfill_hourly",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, epoch_us(ts) // {HOUR_US} AS hour,
               COUNT(*) AS n_raw,
               SUM(CAST(value AS DECIMAL(27,6))) AS vdec
        FROM events GROUP BY event_type, hour
    ),
    b AS (
        SELECT event_type, MIN(hour) AS d0, MAX(hour) AS d1
        FROM hourly GROUP BY event_type
    ),
    cal AS (
        SELECT event_type, UNNEST(generate_series(d0, d1)) AS hour FROM b
    ),
    j AS (
        SELECT cal.event_type, cal.hour,
               COALESCE(n_raw, 0) AS n_raw, vdec
        FROM cal LEFT JOIN hourly USING (event_type, hour)
    )
    SELECT event_type, hour, n_raw,
           CAST(LAST_VALUE(vdec IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS value_ff
    FROM j
    """,
)
def q107_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill (``time_bucket_gapfill`` /
    ``locf`` shape): the hourly per-type value series has ~7% missing
    slots; every slot between each type's first and last hour is
    materialized, empty hours get count 0 and carry the last observed
    hourly total forward. The fill runs on the DECIMAL aggregate and
    casts to double once — so filled values hash-match the oracle
    exactly.

    Scale: see :mod:`yelp_recommender_spark.operators.gapfill` — the
    calendar explode is proportional to the OUTPUT grid, the join and
    the fill window share the (event_type) keying, and forward-fill
    state is one value per key, not a buffered array.
    """
    from yelp_recommender_spark.operators.gapfill import gap_fill_ffill

    hourly = (
        _events_us(spark, sf_dir)
        .groupBy(
            "event_type", F.expr(f"ts_us div {HOUR_US}").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("vdec"),
        )
    )
    filled = gap_fill_ffill(
        hourly, ["event_type"], "hour", 1, ["vdec"], count_col="n_raw"
    )
    return filled.select(
        "event_type",
        "hour",
        "n_raw",
        F.col("vdec_ff").cast("double").alias("value_ff"),
    )


# --------------------------------------------------------------------------
@query(
    "q108_robust_outliers",
    oracle="""
    WITH q AS (
        SELECT event_type,
               ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 6) AS q1,
               ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY value), 6) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, COUNT(*) AS n,
           COUNT(CASE WHEN value > q3 + 1.5 * (q3 - q1)
                      THEN 1 END) AS n_hi,
           ROUND(q3 + 1.5 * (q3 - q1), 6) AS hi_fence
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type, q1, q3
    """,
)
def q108_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-fence outlier detection per event type (Tukey fences — the
    quantile-robust alternative to mean±kσ, immune to the outliers it
    hunts): values above q3 + 1.5·IQR are flagged and counted. Both
    engines interpolate quantiles at the same p·(n−1) index and the
    fence is derived from identically-rounded q1/q3 with identical IEEE
    arithmetic, so the strict > comparison cannot diverge.

    Scale: exact per-group quantiles sort within groups once; the fence
    table is |types| rows and broadcasts back onto the fact stream — the
    production swap at extreme scale is ``approx_percentile`` with a
    documented error bound, same plan shape (cf. q39's note).
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    q = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("q3"),
    )
    fence = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("value") > fence, 1)).alias("n_hi"),
        )
        .select(
            "event_type",
            "n",
            "n_hi",
            F.round(fence, 6).alias("hi_fence"),
        )
    )


# --------------------------------------------------------------------------
_PR_ITERS = 8


def _pagerank_oracle(iters: int) -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs — DuckDB runs
    the exact recurrence the Spark loop executes, one CTE per step."""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    r{k} AS (
        SELECT n.id, (1.0 - 0.85) + 0.85 * COALESCE(c.s, 0.0) AS pr
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS id, SUM(p.pr / e.out_deg) AS s
            FROM e JOIN r{k - 1} p ON p.id = e.src GROUP BY e.dst
        ) c USING (id)
    )""")
    return f"""
    WITH base AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e0 AS (
        SELECT cust AS src, supp AS dst FROM base
        UNION ALL
        SELECT supp AS src, cust AS dst FROM base
    ),
    deg AS (SELECT src, COUNT(*) AS out_deg FROM e0 GROUP BY src),
    e AS (SELECT e0.src, e0.dst, deg.out_deg FROM e0 JOIN deg USING (src)),
    nodes AS (SELECT DISTINCT src AS id FROM e0),
    r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM nodes),
    {",".join(steps)}
    SELECT id, ROUND(pr, 6) AS pr FROM r{iters}
    """


@query("q109_pagerank", oracle=_pagerank_oracle(_PR_ITERS))
def q109_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized customer↔supplier trade graph
    (bipartite edges from orders⋈lineitem, supplier ids offset so the
    id spaces don't collide), 8 iterations, d=0.85, unnormalized O(1)
    scores. The oracle runs the IDENTICAL recurrence as 8 unrolled CTEs
    — rounding to 1e-6 absorbs the ~1e-13 float-summation-order drift
    between engines. Symmetrization means no dangling nodes, so the
    simplified no-redistribution update is exact.

    Scale: see :mod:`yelp_recommender_spark.operators.pagerank` — edges
    are repartitioned on src once and persisted; each iteration moves
    only the rank vector; lineage is truncated every 3 iterations.
    """
    from yelp_recommender_spark.operators.pagerank import pagerank

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    base = (
        t["orders"]
        .join(
            t["lineitem"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + 1000000).alias("supp"),
        )
        .distinct()
    )
    edges = base.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst")
    ).unionByName(
        base.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )
    ranks = pagerank(edges, damping=0.85, iters=_PR_ITERS)
    return ranks.select("id", F.round("rank", 6).alias("pr"))


# --------------------------------------------------------------------------
@query(
    "q110_window_family",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS spend
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, c_mktsegment, spend,
           RANK() OVER w1 AS rnk,
           DENSE_RANK() OVER w1 AS drnk,
           ROUND(PERCENT_RANK() OVER w1, 6) AS prank,
           ROUND(CUME_DIST() OVER w1, 6) AS cdist,
           NTILE(4) OVER w2 AS tile,
           LAG(spend) OVER w2 AS prev_spend
    FROM spend JOIN customer ON c_custkey = o_custkey
    WINDOW w1 AS (PARTITION BY c_mktsegment ORDER BY spend DESC),
           w2 AS (PARTITION BY c_mktsegment
                  ORDER BY spend DESC, c_custkey)
    """,
)
def q110_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family in one pass: rank / dense_rank /
    percent_rank / cume_dist over customer spend within segment, plus
    ntile and lag under a tie-broken total order. The rank family is
    deterministic under ties (it depends only on the ORDER BY value);
    ntile/lag are not, so their window adds c_custkey as a unique
    tiebreak — the distinction matters for reproducible pipelines and is
    the reason for two window specs.

    Scale: the spend aggregate shuffles on o_custkey; both windows
    partition on the low-cardinality segment — fine here because the
    windowed input is the pre-aggregated customer table (one row per
    customer), not raw facts (q97's note applies: window small
    aggregates, never wide fact streams, when the partition key is
    coarse).
    """
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    spend = t["orders"].groupBy("o_custkey").agg(
        dsum("o_totalprice").alias("spend")
    )
    j = spend.join(
        F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    w1 = Window.partitionBy("c_mktsegment").orderBy(F.desc("spend"))
    w2 = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("spend"), "c_custkey"
    )
    return j.select(
        "c_custkey",
        "c_mktsegment",
        "spend",
        F.rank().over(w1).alias("rnk"),
        F.dense_rank().over(w1).alias("drnk"),
        F.round(F.percent_rank().over(w1), 6).alias("prank"),
        F.round(F.cume_dist().over(w1), 6).alias("cdist"),
        F.ntile(4).over(w2).alias("tile"),
        F.lag("spend").over(w2).alias("prev_spend"),
    )


# --------------------------------------------------------------------------
@query(
    "q111_calendar_breakdown",
    oracle="""
    SELECT year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           month(o_orderdate) AS mon,
           (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)
            + 3) % 7 AS dow,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY yr, qtr, mon, dow
    """,
)
def q111_calendar_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-function family: year/quarter/month extraction plus an
    ENGINE-NEUTRAL day-of-week (epoch-day + 3 mod 7, Monday = 0 —
    built-in dayofweek numbering differs between engines, so portable
    pipelines derive it from epoch arithmetic; the same reasoning as the
    epoch-µs policy for event time).

    Scale: map-only extraction folded into the scan projection, one
    shuffle on a ≤ |years|·84·7 composite key with map-side partials.
    """
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    day = F.expr("unix_date(cast(o_orderdate as date))")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.month("o_orderdate").alias("mon"),
            ((day + 3) % 7).alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q112_zipf_slope",
    oracle="""
    WITH toks AS (
        SELECT unnest(list_filter(string_split(regexp_replace(
            lower(text), '[^a-z0-9 ]', ' ', 'g'), ' '), t -> t != ''))
            AS token
        FROM documents
    ),
    tf AS (SELECT token, COUNT(*) AS tf FROM toks GROUP BY token),
    top AS (
        SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS r
        FROM tf QUALIFY r <= 1000
    ),
    xy AS (
        SELECT CAST(ROUND(ln(r), 6) AS DECIMAL(10,6)) AS x,
               CAST(ROUND(ln(tf), 6) AS DECIMAL(10,6)) AS y
        FROM top
    ),
    s AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM xy
    )
    SELECT n AS n_terms,
           ROUND((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS slope
    FROM s
    """,
)
def q112_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf-law slope: least-squares fit of ln(frequency) against
    ln(rank) over the top-1000 terms — the standard corpus-health
    diagnostic (natural text ≈ −1; generated/templated corpora deviate).
    Float policy: per-row logs are rounded to 1e-6 (absorbing libm
    1-ulp differences between JVM and C), then ALL power sums run in
    exact DECIMAL, and the closed-form slope is derived with identical
    IEEE arithmetic — so a regression over a million points would still
    hash-match.

    Scale: term frequencies shuffle on token; top-1000 selection is
    TakeOrdered (no global sort); the regression itself reduces 1000
    rows. Reuses the session-cached token table shared by q20-q26.
    """
    from yelp_recommender_spark.queries.text import _docs_tokens

    toks = _docs_tokens(spark, sf_dir).select(
        F.explode("toks").alias("token")
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    # TakeOrderedAndProject (no global sort): per-partition top-1000
    # merged on the driver side of the exchange
    top = tf.orderBy(F.desc("tf"), F.col("token")).limit(1000)
    r_w = Window.orderBy(F.desc("tf"), F.col("token"))
    xy = top.select(
        F.round(F.log(F.row_number().over(r_w)), 6)
        .cast("decimal(10,6)")
        .alias("x"),
        F.round(F.log("tf"), 6).cast("decimal(10,6)").alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    return s.select(
        n.alias("n_terms"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias(
            "slope"
        ),
    )


# --------------------------------------------------------------------------
@query(
    "q113_split_manifest",
    oracle="""
    WITH u AS (
        SELECT source,
               (CAST('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 12)
                     AS BIGINT) + 1) / 281474976710657.0 AS u
        FROM documents
    )
    SELECT source,
           CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n
    FROM u GROUP BY source, split
    """,
)
def q113_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split manifest per source:
    the split is a pure function of md5(doc_id) (the q37 hash-gate
    construction), so it is reproducible across engines, runs, retries,
    and scale-ups — re-ingesting the corpus never migrates a document
    between splits, the property that prevents silent train/test
    leakage over pipeline re-runs.

    Scale: map-only split assignment + one low-cardinality aggregate;
    the same expression tags the full corpus at write time with zero
    coordination (no global sampling pass).
    """
    from yelp_recommender_spark.functions.sampling import md5_uniform

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    u = md5_uniform("doc_id")
    split = (
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
@query(
    "q114_ewma_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT l_returnflag,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS INT)
                   AS day,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6)))
                    AS DOUBLE) AS rev
        FROM lineitem GROUP BY l_returnflag, day
    )
    SELECT l_returnflag,
           COUNT(*) AS n_days,
           ROUND(list_reduce(list(rev ORDER BY day),
                             (acc, x) -> acc * (1.0 - 0.2) + 0.2 * x),
                 4) AS ewma_last
    FROM daily GROUP BY l_returnflag
    """,
)
def q114_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of the daily revenue series per return flag
    (α = 0.2), reporting each series' final smoothed level — the
    grouped-map Arrow showcase for genuinely recursive computations
    (see :mod:`yelp_recommender_spark.operators.ewma` for why no bounded
    SQL window can express it). The oracle runs the SAME left-fold
    recurrence via DuckDB ``list_reduce``; rounding to 1e-4 absorbs the
    recurrence-form float drift (pandas' kernel may compute
    y + α(x−y) instead of (1−α)y + αx — equal in ℝ, ~1e-11 apart in
    float on 1e5-scale values).

    Scale: the smoothed input is the per-day AGGREGATE (one shuffle),
    so each key's series is ~thousands of rows; the recurrence is
    sequential per key by nature and parallel across keys.
    """
    from yelp_recommender_spark.operators.ewma import ewma_by_key

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    daily = (
        li.withColumn("day", F.expr("unix_date(cast(l_shipdate as date))"))
        .groupBy("l_returnflag", "day")
        .agg(dsum("l_extendedprice").alias("rev"))
    )
    smoothed = ewma_by_key(
        daily, ["l_returnflag"], "day", "rev", alpha=0.2
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("day"))
    wall = Window.partitionBy("l_returnflag")
    return (
        smoothed.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_days", F.count(F.lit(1)).over(wall))
        .filter(F.col("_rn") == 1)
        .select(
            "l_returnflag",
            "n_days",
            F.round("ewma", 4).alias("ewma_last"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q115_quality_report",
    oracle="""
    SELECT 'not_null:l_orderkey' AS check_name,
           CAST(COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT)
               AS n_violations,
           COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) = 0 AS passed
    FROM lineitem
    UNION ALL
    SELECT 'range:l_quantity[1,40]',
           COUNT(CASE WHEN l_quantity IS NOT NULL
                       AND (l_quantity < 1 OR l_quantity > 40)
                      THEN 1 END),
           COUNT(CASE WHEN l_quantity IS NOT NULL
                       AND (l_quantity < 1 OR l_quantity > 40)
                      THEN 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'range:l_discount[0.0,0.1]',
           COUNT(CASE WHEN l_discount IS NOT NULL
                       AND (l_discount < 0.0 OR l_discount > 0.1)
                      THEN 1 END),
           COUNT(CASE WHEN l_discount IS NOT NULL
                       AND (l_discount < 0.0 OR l_discount > 0.1)
                      THEN 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'accepted_values:l_returnflag',
           COUNT(CASE WHEN l_returnflag IS NOT NULL
                       AND l_returnflag NOT IN ('A', 'N', 'R')
                      THEN 1 END),
           COUNT(CASE WHEN l_returnflag IS NOT NULL
                       AND l_returnflag NOT IN ('A', 'N', 'R')
                      THEN 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'unique:l_orderkey,l_linenumber',
           COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)),
           COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) = 0
    FROM lineitem
    UNION ALL
    SELECT 'foreign_key:l_orderkey->o_orderkey',
           (SELECT COUNT(*) FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL),
           (SELECT COUNT(*) FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL) = 0
    """,
)
def q115_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite over lineitem (Deequ/expectations
    shape): nullability, two ranges, accepted values, key uniqueness,
    and referential integrity to orders — compiled to one scan for ALL
    row-level checks plus one distinct-count and one broadcast anti-join
    (see :mod:`yelp_recommender_spark.operators.quality`). The
    range:l_quantity[1,40] and uniqueness checks FAIL on this data by
    design — a quality report that can only pass gates nothing.

    Scale: row-level constraint count doesn't change the scan count
    (conditional counts fuse into one aggregate); each declared key set
    adds exactly one keyed shuffle; the FK probe broadcasts the distinct
    referenced keys.
    """
    from yelp_recommender_spark.operators.quality import check_constraints

    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    suite = [
        {"type": "not_null", "col": "l_orderkey"},
        {"type": "range", "col": "l_quantity", "lo": 1, "hi": 40},
        {"type": "range", "col": "l_discount", "lo": 0.0, "hi": 0.1},
        {
            "type": "accepted_values",
            "col": "l_returnflag",
            "values": ["A", "N", "R"],
        },
        {"type": "unique", "cols": ["l_orderkey", "l_linenumber"]},
        {
            "type": "foreign_key",
            "col": "l_orderkey",
            "ref": t["orders"],
            "ref_col": "o_orderkey",
        },
    ]
    return check_constraints(t["lineitem"], suite)


# --------------------------------------------------------------------------
@query(
    "q117_hierarchy_closure",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT DISTINCT c_custkey AS node,
               CAST((c_custkey - (c_custkey % 10)) / 10 AS BIGINT) AS anc
        FROM customer WHERE c_custkey >= 1
    ),
    cl AS (
        SELECT node, anc, 1 AS depth FROM e
        UNION ALL
        SELECT cl.node, e.anc, cl.depth + 1
        FROM cl JOIN e ON cl.anc = e.node
    )
    SELECT node, anc, MIN(depth) AS depth FROM cl GROUP BY node, anc
    """,
)
def q117_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal (the WITH RECURSIVE gap): the full
    ancestor closure with hop depth over a synthetic decimal-digit
    hierarchy on customer keys (parent = key div 10 — a forest rooted at
    0, ~5 levels at sf0.1). The oracle IS a recursive CTE; Spark runs
    the same fixpoint as a frontier-join loop
    (:func:`yelp_recommender_spark.operators.hierarchy.ancestors`).

    Scale: each round joins only the PREVIOUS round's paths (the
    frontier) against the once-partitioned edge table — |closure| total
    rows ever move, the minimum for closure materialization; rounds =
    hierarchy height, bounded against cyclic data bugs.
    """
    from yelp_recommender_spark.operators.hierarchy import ancestors

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    edges = cust.filter(F.col("c_custkey") >= 1).select(
        F.col("c_custkey").alias("child"),
        F.expr("c_custkey div 10").alias("parent"),
    )
    return ancestors(edges)


# --------------------------------------------------------------------------
@query(
    "q118_embedding_norms",
    oracle="""
    WITH n AS (
        SELECT label,
               ROUND(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
                   AS norm_r
        FROM embeddings
    )
    SELECT label, COUNT(*) AS n,
           CAST(SUM(CAST(norm_r AS DECIMAL(17,6))) AS DOUBLE) / COUNT(*)
               AS avg_norm,
           MIN(norm_r) AS min_norm,
           MAX(norm_r) AS max_norm
    FROM n GROUP BY label
    """,
)
def q118_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm audit per label — the preprocessing diagnostic run
    before choosing cosine vs dot-product indexing (unnormalized models
    hide magnitude signal that cosine throws away; the audit makes the
    decision data-driven). The norm is a pure higher-order column
    expression (cast → square → left-fold → sqrt), reproduced
    operation-for-operation by the oracle, then rounded and aggregated
    under the exact-DECIMAL policy.

    Scale: map-only per-row fold + one tiny keyed aggregate; this is the
    cheap pass :func:`~yelp_recommender_spark.operators.embed_prep.l2_normalize`
    shares its kernel with.
    """
    from yelp_recommender_spark.operators.embed_prep import vector_norm

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    n = emb.select(
        "label", F.round(vector_norm("embedding"), 6).alias("norm_r")
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("norm_r").cast("decimal(17,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_norm"),
        F.min("norm_r").alias("min_norm"),
        F.max("norm_r").alias("max_norm"),
    )


# --------------------------------------------------------------------------
@query(
    "q119_stats_family",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(27,6))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS sy,
               SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(27,6)))
                   AS sxy,
               SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,6))) AS sxx,
               SUM(CAST(l_extendedprice * l_extendedprice
                        AS DECIMAL(27,6))) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS corr_qty_price,
           ROUND((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (n * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (n * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / n,
                 6) AS intercept
    FROM s
    """,
)
def q119_stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate family (corr / regr_slope / regr_intercept
    per group) computed from EXACT decimal power sums with the closed
    forms evaluated in identical IEEE order — NOT the builtin
    ``corr``/``regr_*`` aggregates, whose accumulation-order float drift
    differs between engines by more than any reasonable rounding can
    absorb at hash-exact gating (the reason q51's Pearson uses the same
    construction). At a million rows the power sums are still exact;
    determinism is scale-independent.

    Scale: one shuffle on a 3-value key with map-side decimal partials —
    the six power sums ride the same aggregate.
    """
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    dec = "decimal(27,6)"
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * y).cast(dec)).alias("sxy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((y * y).cast(dec)).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return s.select(
        "l_returnflag",
        "n",
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


# --------------------------------------------------------------------------
@query(
    "q120_bag_set_ops",
    oracle="""
    WITH a AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
         r AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
         ex AS (SELECT * FROM a EXCEPT ALL SELECT * FROM r),
         ix AS (SELECT * FROM a INTERSECT ALL SELECT * FROM r)
    SELECT 'except_all' AS op, l_partkey, COUNT(*) AS n
    FROM ex GROUP BY l_partkey
    UNION ALL
    SELECT 'intersect_all', l_partkey, COUNT(*)
    FROM ix GROUP BY l_partkey
    """,
)
def q120_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operators (EXCEPT ALL / INTERSECT ALL) — the
    multiset complements of q06/q10's distinct-set membership: per-part
    'A'-shipment multiplicity minus/intersected-with 'R'-shipment
    multiplicity. Both engines implement the SQL-standard bag algebra
    (max(m−n, 0) and min(m, n) copies), which the grouped counts expose
    value-for-value.

    Scale: Spark plans ``exceptAll``/``intersectAll`` as a count-
    difference aggregate + generator (one shuffle on the value, no
    pairwise join) — the right plan at any cardinality; the final
    grouped count reuses the same hash key.
    """
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    # ONE scan + one shuffle (r10; was 4 scans — a and r each planned
    # once per set operator): the grouped EXCEPT ALL / INTERSECT ALL
    # counts are pure bag algebra over per-key multiplicities,
    # n_except = max(m−n, 0) and n_intersect = min(m, n), which one
    # conditional aggregate exposes exactly (integer counts — no float
    # concerns). The explode-the-fates shape emits both report rows per
    # key and the n > 0 filter drops exactly the keys the set operators
    # would not have produced.
    m, n = F.col("m"), F.col("nr")
    agg = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("m"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("nr"),
        )
    )
    return (
        agg.select(
            "l_partkey",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("except_all").alias("op"),
                        (m - n).alias("n"),
                    ),
                    F.struct(
                        F.lit("intersect_all").alias("op"),
                        F.least(m, n).alias("n"),
                    ),
                )
            ).alias("e"),
        )
        .filter(F.col("e.n") > 0)
        .select(F.col("e.op").alias("op"), "l_partkey", F.col("e.n").alias("n"))
    )


# --------------------------------------------------------------------------
@query(
    "q121_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           lpad(p_name, 15, '.') AS padded,
           translate(p_name, 'aeiou', '#####') AS devoweled,
           reverse(p_name) AS rev,
           instr(p_name, 'ol') AS pos_ol,
           length(replace(p_name, ' ', '')) AS n_nonspace,
           substr(p_name, 1, 3) || '…' || split_part(p_name, ' ', 2)
               AS abbrev
    FROM part
    """,
)
def q121_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface parity: upper / lpad / translate /
    reverse / instr / replace+length / substr / concat / token
    extraction, all as JVM codegen'd builtins evaluated identically by
    both engines — the everyday SQL string toolkit a reference user
    expects to keep working after switching engines.

    Scale: map-only projection folded into the scan; no shuffle at all.
    """
    p = load_tables(spark, sf_dir, ["part"])["part"]
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lpad("p_name", 15, ".").alias("padded"),
        F.translate("p_name", "aeiou", "#####").alias("devoweled"),
        F.reverse("p_name").alias("rev"),
        F.instr(F.col("p_name"), "ol").alias("pos_ol"),
        F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit(""))).alias(
            "n_nonspace"
        ),
        F.concat(
            F.substring("p_name", 1, 3),
            F.lit("…"),
            F.split("p_name", " ").getItem(1),
        ).alias("abbrev"),
    )


# --------------------------------------------------------------------------
@query(
    "q122_array_hof",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS n_items,
           COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_hi,
           CAST(COALESCE(SUM(CASE WHEN l_quantity > 25
                    THEN CAST(l_quantity AS DECIMAL(17,6)) END), 0)
                AS DOUBLE) AS sum_hi_qty,
           CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(17,6)))
                AS DOUBLE) AS disc_qty,
           MAX(l_quantity) AS max_q
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q122_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface: per-order line quantities as
    a deterministic sorted array, processed entirely with HOFs —
    ``transform`` (struct field extraction), ``filter`` (quantity gate),
    ``zip_with`` (quantity×discount), and a TYPE-STABLE decimal
    ``aggregate`` fold ((acc + cast(x)).cast(acc_type) — the cast-back
    keeps the fold's accumulator type fixed, which Spark requires, while
    staying exact). The oracle computes the identical values relationally
    — gating that the array algebra equals the relational algebra it
    re-expresses.

    Scale: one shuffle to build per-order arrays; all HOFs are row-local
    JVM expressions over the collected line array (bounded by lines per
    order, ~7 — the legitimate collect_list case, unlike unbounded
    per-user event arrays which q102 caps before collecting).
    """
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    g = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_quantity").alias("q"),
                F.col("l_discount").alias("d"),
            ).alias("s"),
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
    )
    qs = F.transform("arr", lambda s: s["q"])
    hi = F.filter(qs, lambda x: x > 25)
    prods = F.zip_with(
        qs, F.transform("arr", lambda s: s["d"]), lambda q, d: q * d
    )

    def dec_sum(arr):
        return F.aggregate(
            arr,
            F.lit(0).cast("decimal(27,6)"),
            lambda acc, x: (acc + x.cast("decimal(17,6)")).cast(
                "decimal(27,6)"
            ),
        ).cast("double")

    return g.select(
        "l_orderkey",
        F.size("arr").cast("long").alias("n_items"),
        F.size(hi).cast("long").alias("n_hi"),
        dec_sum(hi).alias("sum_hi_qty"),
        dec_sum(prods).alias("disc_qty"),
        F.array_max(qs).alias("max_q"),
    )
