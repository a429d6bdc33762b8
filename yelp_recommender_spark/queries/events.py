"""Event-table queries — time windows, sessionization, JSON props, exact
dedup. These are the *batch* semantics of the streaming operators in
:mod:`yelp_recommender_spark.streaming` (no streaming in the reference —
SURVEY.md §2.11 — so this surface is greenfield, designed Spark-first).

Timestamp parity note: events.ts is INT64 TIMESTAMP(NANOS) parquet; the
representation Spark surfaces is version-dependent (raw-nanos LONG under
the legacy conf, TIMESTAMP_NTZ natively on 4.1+) while DuckDB truncates
to µs. All time arithmetic therefore runs on integer epoch-microseconds
derived by :func:`~yelp_recommender_spark.functions.eventtime.epoch_us`
— exact on both engines, no float boundaries, timezone-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.eventtime import with_ts_us
from yelp_recommender_spark.functions.exact_agg import davg, dsum
from yelp_recommender_spark.queries.registry import query
from yelp_recommender_spark.sources.tables import load_tables

HOUR_US = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_ts_us(load_tables(spark, sf_dir, ["events"])["events"])


# --------------------------------------------------------------------------
@query(
    "q16_events_hourly",
    oracle=f"""
    SELECT event_type,
           epoch_us(ts) // {HOUR_US} AS hour_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type, hour_bucket
    """,
)
def q16_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregation (batch analog of streaming
    ``groupBy(window(ts, '1 hour'))``); bucket = epoch-hour, engine/TZ
    neutral. One shuffle on a low-cardinality composite key with map-side
    partials."""
    return (
        _events_us(spark, sf_dir)
        .withColumn("hour_bucket", F.expr(f"ts_us div {HOUR_US}"))
        .groupBy("event_type", "hour_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q17_events_props_extract",
    oracle="""
    SELECT CAST(REGEXP_EXTRACT(props, '"k":\\s*(\\d+)', 1) AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value) AS avg_value
    FROM events
    WHERE props IS NOT NULL
    GROUP BY k_bucket
    """,
)
def q17_events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction (F16 analog — the reference JSON-decodes
    per record in Python; here a JVM regexp over the string column)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.filter(F.col("props").isNotNull())
        .withColumn(
            "k_bucket",
            (F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int") % 10),
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            davg("value").alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q18_user_sessions",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
    FROM gaps GROUP BY user_id
    """,
)
def q18_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>30min flag + sum (batch form of streaming
    ``session_window``). One shuffle on user_id; the window and the
    aggregate reuse the same partitioning — no second exchange."""
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions")
    )


# --------------------------------------------------------------------------
@query(
    "q19_events_dedup_exact",
    oracle="""
    SELECT event_type, COUNT(*) AS n_raw,
           COUNT(DISTINCT user_id) AS n_unique_users
    FROM events GROUP BY event_type
    """,
)
def q19_events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-key dedup counts (T4/T5)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.countDistinct("user_id").alias("n_unique_users"),
    )


# --------------------------------------------------------------------------
@query(
    "q36_describe_stats",
    oracle="""
    SELECT 'value' AS column, COUNT(v) AS n,
           ROUND(AVG(v), 6) AS mean, ROUND(stddev_pop(v), 6) AS stddev,
           ROUND(MIN(v), 6) AS min, ROUND(MAX(v), 6) AS max
    FROM (SELECT CAST(value AS DOUBLE) AS v FROM events
          WHERE NOT isnan(CAST(value AS DOUBLE)))
    UNION ALL
    SELECT 'user_id', COUNT(v),
           ROUND(AVG(v), 6), ROUND(stddev_pop(v), 6),
           ROUND(MIN(v), 6), ROUND(MAX(v), 6)
    FROM (SELECT CAST(user_id AS DOUBLE) AS v FROM events)
    """,
)
def q36_describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: the reference's RDD ``.stats()`` diagnostic
    (``als_recommender.py:165``) as one distributed aggregation —
    count/mean/population-stddev/min/max per numeric column, long form.
    All columns aggregate in a single job (struct array exploded from one
    agg row); round(6) absorbs the summation-order difference between
    engines (registry float policy)."""
    from yelp_recommender_spark.models.evaluator import describe_stats

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return describe_stats(ev, ["value", "user_id"])


# --------------------------------------------------------------------------
@query(
    "q39_value_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)), 6) AS p50,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)), 6) AS p90,
           ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def q39_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (interpolated, R-7 — the same
    definition as the oracle's ANSI percentile_cont — portable
    verbatim to both engines since r6): the tail-latency /
    value-distribution diagnostic. Spark's ``percentile`` sorts within
    the group — exact and oracle-checkable; at 100 TB swap in
    ``approx_percentile`` (t-digest, mergeable sketches) where the
    ±ε contract is acceptable — same plan shape, no sort."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# --------------------------------------------------------------------------
@query(
    "q65_asof_join",
    oracle="""
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY user_id, epoch_us(ts)
    ),
    c AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts_us, v.view_value AS view_value_asof
    FROM c ASOF LEFT JOIN v
      ON c.user_id = v.user_id AND c.ts_us >= v.ts_us
    """,
)
def q65_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join — each click stamped with the value of the
    user's latest view at-or-before it (the attribution / feature-
    staleness primitive). Spark has no ASOF JOIN; the operator
    (operators/asof.py) composes union + per-key running-window
    carry-forward — one shuffle, no range-join blowup — and the oracle
    verifies it against DuckDB's NATIVE ASOF JOIN row-for-row. Views
    are pre-aggregated to one row per (user, ts) (max value), the
    operator's uniqueness requirement."""
    from yelp_recommender_spark.operators.asof import asof_join

    ev = with_ts_us(load_tables(spark, sf_dir, ["events"])["events"])
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("view_value"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    return asof_join(
        clicks, views, keys=["user_id"], ts_col="ts_us",
        value_cols=["view_value"],
    ).select(
        "event_id", "user_id", "ts_us",
        F.col("view_value_asof"),
    )


# --------------------------------------------------------------------------
@query(
    "q66_range_join",
    oracle="""
    WITH spans AS (
        SELECT user_id, event_type,
               MIN(epoch_us(ts)) AS span_start,
               MAX(epoch_us(ts)) AS span_end
        FROM events GROUP BY user_id, event_type
    ),
    p AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, COUNT(*) AS n_spans
    FROM p JOIN spans
      ON p.user_id = spans.user_id
     AND p.ts_us BETWEEN spans.span_start AND spans.span_end
    GROUP BY p.event_id, p.user_id
    """,
)
def q66_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: each purchase counted against the
    per-(user, event_type) activity spans containing it. Spark plans the
    raw inequality join as a nested loop; the operator
    (operators/rangejoin.py) bucketizes, explodes intervals to covered
    buckets, and equi-joins on (user, bucket) + exact between-filter —
    one hash join, each qualifying pair emitted exactly once. The bucket
    width is DERIVED from the span-length stats (median, explode-capped
    — r4's hardcoded 1-day constant scaled linearly with the time
    range), so a 100× wider history widens the buckets instead of the
    exploded row count. The oracle states the plain inequality join
    (fine at test scale) and must agree row-for-row."""
    from yelp_recommender_spark.operators.rangejoin import range_join_points

    from yelp_recommender_spark.cache import register_persist

    ev = with_ts_us(load_tables(spark, sf_dir, ["events"])["events"])
    # persisted (session registry): the span table feeds BOTH the
    # auto-width stats probe and the bucketized join — without the cache
    # the events scan + span aggregate would run twice
    spans = register_persist(
        ev.groupBy("user_id", "event_type").agg(
            F.min("ts_us").alias("span_start"),
            F.max("ts_us").alias("span_end"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    joined = range_join_points(
        # drop the span's type column, keep its row (two types with an
        # identical span still contribute two rows, like the oracle)
        purchases, spans.drop("event_type"),
        keys=["user_id"], pt_col="ts_us",
        start_col="span_start", end_col="span_end",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_spans")
    )


# --------------------------------------------------------------------------
@query(
    "q67_time_rollup",
    oracle="""
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (day, hour)
    """,
)
def q67_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (the hypertable continuous-aggregate
    shape): per (day, hour), per day, and grand total in ONE pass via
    GROUP BY ROLLUP — Spark computes all grouping sets in a single
    shuffle with partial aggregation, exactly what a tiered
    minute→hour→day rollup materialization does. Day/hour are integer
    epoch-µs arithmetic (timezone-free, both engines identical); sums
    use the exact decimal accumulator."""
    ev = with_ts_us(load_tables(spark, sf_dir, ["events"])["events"])
    day = (F.col("ts_us") / F.lit(86_400_000_000)).cast("long")
    hour = ((F.col("ts_us") / F.lit(3_600_000_000)).cast("long") % 24)
    return (
        ev.select(day.alias("day"), hour.alias("hour"), "value")
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "q80_sketch_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def q80_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality sketching accuracy gate: exact COUNT DISTINCT next to
    HyperLogLog++ (``approx_count_distinct``, rsd=0.01) with a boolean
    asserting the sketch lands within 5% of truth. The oracle pins the
    exact counts and expects ``approx_ok = TRUE`` — so the sketch's
    accuracy contract is itself oracle-checked, the pattern for gating
    any approximate operator against an exact twin.

    Scale: this is the 100-TB distinct-count plan — HLL sketches merge
    associatively in partial aggregation (fixed ~kB state per group), so
    the exchange carries sketches, not user ids; the exact twin shuffles
    every distinct id and exists here only as the gate's ground truth."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
    )
    ok = (
        F.abs(F.col("_approx") - F.col("exact_users"))
        / F.col("exact_users").cast("double")
        <= 0.05
    )
    return agg.select("event_type", "exact_users", ok.alias("approx_ok"))


# --------------------------------------------------------------------------
@query(
    "q82_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k
    FROM events WHERE props IS NOT NULL
    GROUP BY event_type
    """,
)
def q82_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through the VARIANT type (Spark 4):
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` path access — the open-schema path for JSON columns
    whose shape isn't known at write time (q17 is the closed-schema twin
    via regexp/from_json).

    Scale: variant parse+access is JVM-side and columnar; unlike
    repeated regexp/get_json_object calls the document parses ONCE per
    row however many paths are later accessed, and shredded storage can
    push path access to the scan."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.filter(F.col("props").isNotNull())
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


# --------------------------------------------------------------------------
# Z-order layout (operators/zorder.py): the Morton code is pure bit
# algebra, so the oracle is the SAME expression text generated by
# zvalue_sql — Spark and DuckDB can never drift independently.
_Z_N_BITS = 10  # user_id < 1024 and the data's Jan-2024 hour span < 1024
_Z_EPOCH_HOUR0 = 473352  # 2024-01-01T00:00Z in hours since the epoch

from yelp_recommender_spark.operators.zorder import (  # noqa: E402
    zvalue,
    zvalue_sql,
)


@query(
    "q83_zorder_events",
    oracle=f"""
    WITH keyed AS (
        SELECT event_id, user_id,
               (epoch_us(ts) // 3600000000) - {_Z_EPOCH_HOUR0} AS hour_idx
        FROM events
    )
    SELECT event_id, user_id, CAST(hour_idx AS BIGINT) AS hour_idx,
           CAST({zvalue_sql(['user_id', 'hour_idx'], _Z_N_BITS)} AS BIGINT) AS z
    FROM keyed
    ORDER BY z, event_id
    LIMIT 100
    """,
)
def q83_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) code over (user_id, hour-of-month) — the sort
    key a layout-optimizing write uses so parquet min/max footers prune
    on BOTH dimensions (``write_zordered``). First 100 events along the
    curve; the oracle runs the byte-identical bit-interleave expression
    (generated by the same ``zvalue_sql``), so this gates the exact bit
    algebra, not just row counts.

    Scale: the code is shift/mask/add Column algebra — codegen'd,
    map-only; the layout write adds one range-partition shuffle and buys
    file skipping on every interleaved dimension (tests/test_zorder.py
    verifies the footer min/max tightening)."""
    ev = _events_us(spark, sf_dir).select(
        "event_id",
        "user_id",
        (
            F.expr("ts_us div 3600000000") - F.lit(_Z_EPOCH_HOUR0)
        ).alias("hour_idx"),
    )
    return (
        ev.withColumn("z", zvalue(["user_id", "hour_idx"], _Z_N_BITS))
        .orderBy("z", "event_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q92_event_type_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click_n,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error_n,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup_n,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view_n,
           CAST(SUM(CAST(value AS DECIMAL(27,6)))
                FILTER (WHERE event_type = 'purchase') AS DOUBLE)
               AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def q92_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event counts by type plus purchase
    value, via ``groupBy().pivot(values=...)`` — the feature-engineering
    move that turns an event log into a per-entity feature row.

    The pivot VALUES are passed explicitly: without them Spark runs an
    eager distinct scan over the whole table just to discover column
    names — at 100 TB that is a full extra job before planning even
    finishes, and the output schema becomes data-dependent (a new enum
    value silently widens every downstream consumer). With the domain
    declared, the plan is the standard two-stage pivot: partial-agg on
    (user, type), shuffle, then pivotfirst on user — the second exchange
    moves only the ~|types| pre-aggregated rows per user, so the cost is
    one real shuffle plus a trivial one. (When even that matters, the
    same result is a single-shuffle manual conditional aggregation —
    ``count(when(type==t, 1))`` per value — at the price of not using
    the pivot operator.)

    Absent (user, type) cells: count columns coalesce to 0 (matching the
    oracle's ``COUNT(*) FILTER``, which yields 0 not NULL); the value sum
    stays NULL (both engines agree SUM over no rows is NULL)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("val"),
        )
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n")
            for t in _EVENT_TYPES
        ],
        F.col("purchase_val").alias("purchase_value"),
    )


# --------------------------------------------------------------------------
@query(
    "q94_sketch_percentiles",
    oracle="""
    SELECT event_type, CAST(0.5 AS DOUBLE) AS p,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS exact_value,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, CAST(0.9 AS DOUBLE),
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6), TRUE
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, CAST(0.99 AS DOUBLE),
           ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY value), 6), TRUE
    FROM events GROUP BY event_type
    """,
)
def q94_sketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketching accuracy gate — q80's exact-twin pattern
    applied to percentiles: exact interpolated ``percentile`` next to
    the Greenwald-Khanna sketch (``percentile_approx``, accuracy=100 ⇒
    rank error ε ≤ 1%), with a boolean asserting each sketch value lands
    inside the exact [p−2ε, p+2ε] percentile envelope (2ε: one ε is the
    sketch's guarantee, the second absorbs the ±1-rank difference
    between interpolated and element quantiles). The oracle pins the
    exact values (Spark ``percentile`` and the oracle's ANSI
    ``percentile_cont`` are both type-7 linear interpolation) and expects ``approx_ok = TRUE``.

    Scale: GK sketches merge associatively with bounded state
    (O(1/ε log εn) per group), so the exchange carries sketches — the
    100-TB quantile plan. The exact twin sorts every group value and
    exists only as the gate's ground truth."""
    ps = [0.5, 0.9, 0.99]
    eps = 1.0 / 100.0
    lo = [max(0.0, p - 2 * eps) for p in ps]
    hi = [min(1.0, p + 2 * eps) for p in ps]
    arr = lambda xs: F.array(*[F.lit(x) for x in xs])  # noqa: E731
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    agg = ev.groupBy("event_type").agg(
        F.percentile("value", arr(ps)).alias("_ex"),
        F.percentile("value", arr(lo)).alias("_lo"),
        F.percentile("value", arr(hi)).alias("_hi"),
        F.percentile_approx("value", arr(ps), F.lit(100)).alias("_ap"),
    )
    z = F.posexplode(F.arrays_zip("_ex", "_lo", "_hi", "_ap"))
    rows = agg.select("event_type", z.alias("_i", "_q"))
    p_of = F.element_at(arr(ps), F.col("_i") + 1)
    ok = (F.col("_q._ap") >= F.col("_q._lo")) & (
        F.col("_q._ap") <= F.col("_q._hi")
    )
    return rows.select(
        "event_type",
        p_of.alias("p"),
        F.round(F.col("_q._ex"), 6).alias("exact_value"),
        ok.alias("approx_ok"),
    )
