"""Recommender queries — the reference's model families
(SURVEY.md §2.9/§3) run end-to-end on the star schema via the
deterministic ratings adapter (:mod:`yelp_recommender_spark.models.ratings`):
"user o_custkey rated item l_partkey", content text from the part
dimension, every-10th-order held out.

Oracle-checked: baseline predict + its RMSE, item-CF weights
(pearson/cosine/jaccard), item-CF and user-CF full prediction chains,
content-based one-hot cosine predict. Rows-only (iterative MLlib, not
SQL-expressible): ALS and the ALS+GBT hybrid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yelp_recommender_spark.models.als_hybrid import (
    hybrid_features,
    predict_als,
    predict_hybrid,
    train_als,
    train_hybrid_regressor,
)
from yelp_recommender_spark.models.baseline import fit_avgs, predict_baseline
from yelp_recommender_spark.models.cf import (
    corated_weights,
    dedup_ratings,
    predict_item_cf,
    predict_user_cf,
    top_n_neighbors,
)
from yelp_recommender_spark.models.content_based import (
    fit_content,
    predict_content,
)
from yelp_recommender_spark.models.evaluator import rmse
from yelp_recommender_spark.models.ratings import (
    DUCK_TEST,
    DUCK_TRAIN,
    derive_ratings,
    train_test_split,
)
from yelp_recommender_spark.queries.registry import query
from yelp_recommender_spark.sources.tables import load_tables

# ---------------------------------------------------------------- SQL twins
_AVG = "CAST(SUM(CAST(stars AS DECIMAL(27,6))) AS DOUBLE) / COUNT(stars)"

DUCK_AVGS = f"""
    train AS ({DUCK_TRAIN}),
    test AS ({DUCK_TEST}),
    user_avg AS (SELECT user_id, {_AVG} AS user_avg FROM train GROUP BY user_id),
    biz_avg AS (SELECT business_id, {_AVG} AS biz_avg FROM train GROUP BY business_id)
"""

_BASELINE_SELECT = """
    SELECT t.user_id, t.business_id,
           COALESCE((user_avg + biz_avg) / 2, user_avg, biz_avg, 2.5) AS stars,
           CASE WHEN user_avg IS NOT NULL AND biz_avg IS NOT NULL THEN 'both_avg'
                WHEN user_avg IS NOT NULL THEN 'usr_avg'
                WHEN biz_avg IS NOT NULL THEN 'biz_avg'
                ELSE 'default' END AS decision
    FROM (SELECT DISTINCT user_id, business_id FROM test) t
    LEFT JOIN user_avg USING (user_id)
    LEFT JOIN biz_avg USING (business_id)
"""

# dedup to one rating per (user, item) — exact decimal mean
DUCK_R = f"""
    r AS (SELECT user_id, business_id, {_AVG} AS stars
          FROM train GROUP BY user_id, business_id)
"""

DUCK_WEIGHTS = """
    stats AS (
        SELECT business_id, COUNT(*) AS n,
               SQRT(CAST(SUM(CAST(stars * stars AS DECIMAL(27,12))) AS DOUBLE)) AS norm
        FROM r GROUP BY business_id
    ),
    pair_agg AS (
        SELECT a.business_id AS e1, b.business_id AS e2,
               COUNT(*) AS n_common,
               CAST(SUM(CAST(a.stars AS DECIMAL(27,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(b.stars AS DECIMAL(27,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(a.stars * b.stars AS DECIMAL(27,12))) AS DOUBLE) AS dot,
               CAST(SUM(CAST(a.stars * a.stars AS DECIMAL(27,12))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(b.stars * b.stars AS DECIMAL(27,12))) AS DOUBLE) AS syy
        FROM r a JOIN r b
          ON a.user_id = b.user_id AND a.business_id < b.business_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    weights AS (
        SELECT e1, e2, n_common,
               ROUND(CASE WHEN n_common * sxx - sx * sx <= 0
                            OR n_common * syy - sy * sy <= 0 THEN 0.0
                          ELSE (n_common * dot - sx * sy)
                               / SQRT((n_common * sxx - sx * sx)
                                      * (n_common * syy - sy * sy)) END,
                     6) AS pearson,
               ROUND(CASE WHEN s1.norm = 0 OR s2.norm = 0 THEN 0.0
                          ELSE dot / (s1.norm * s2.norm) END, 6) AS cosine,
               ROUND(n_common / (s1.n + s2.n - n_common), 6) AS jaccard
        FROM pair_agg
        JOIN stats s1 ON e1 = s1.business_id
        JOIN stats s2 ON e2 = s2.business_id
    )
"""


def _test_pairs(test: DataFrame) -> DataFrame:
    return test.select("user_id", "business_id").distinct()


# --------------------------------------------------------------------------
@query(
    "q50_baseline_predict",
    oracle=f"WITH {DUCK_AVGS} {_BASELINE_SELECT}",
)
def q50_baseline_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SURVEY §7 minimum slice: scan → two mean aggs → two broadcast
    left joins → cold-start coalesce ladder, decision-tagged."""
    train, test = train_test_split(derive_ratings(spark, sf_dir))
    user_avg, biz_avg = fit_avgs(train)
    return predict_baseline(_test_pairs(test), user_avg, biz_avg)


# --------------------------------------------------------------------------
@query(
    "q51_item_cf_weights",
    oracle=f"""
    WITH train AS ({DUCK_TRAIN}), {DUCK_R}, {DUCK_WEIGHTS}
    SELECT * FROM weights
    """,
)
def q51_item_cf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-rating weights: Pearson (zero-variance → 0), cosine
    over full rating vectors, Jaccard over rater sets, co-rated ≥ 2
    (J4/P4/F8-F10). The pair join distributes on the user key."""
    train, _ = train_test_split(derive_ratings(spark, sf_dir))
    return corated_weights(train, "business_id", "user_id", min_corated=2)


# --------------------------------------------------------------------------
_PREDICT_ITEM_CF = """
    sym AS (
        SELECT e1, e2, pearson AS w FROM weights
        UNION ALL
        SELECT e2 AS e1, e1 AS e2, pearson AS w FROM weights
    ),
    topn AS (
        SELECT e1, e2, w FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY e1
                                         ORDER BY w DESC, e2 ASC) AS rn
            FROM sym
        ) WHERE rn <= 10
    ),
    tp AS (SELECT DISTINCT user_id, business_id FROM test),
    scored AS (
        SELECT tp.user_id, tp.business_id,
               CASE WHEN CAST(SUM(CAST(ABS(n.w) AS DECIMAL(38,12))) AS DOUBLE) > 0
                    THEN ROUND(
                        CAST(SUM(CAST(n.w * r.stars AS DECIMAL(38,12))) AS DOUBLE)
                        / CAST(SUM(CAST(ABS(n.w) AS DECIMAL(38,12))) AS DOUBLE), 6)
               END AS cf_score
        FROM tp
        JOIN topn n ON tp.business_id = n.e1
        JOIN r ON r.user_id = tp.user_id AND r.business_id = n.e2
        GROUP BY tp.user_id, tp.business_id
    )
    SELECT tp.user_id, tp.business_id,
           COALESCE(cf_score, user_avg, biz_avg, 2.5) AS stars,
           CASE WHEN cf_score IS NOT NULL THEN 'cf'
                WHEN user_avg IS NOT NULL THEN 'usr_avg'
                WHEN biz_avg IS NOT NULL THEN 'biz_avg'
                ELSE 'default' END AS decision
    FROM tp
    LEFT JOIN scored USING (user_id, business_id)
    LEFT JOIN user_avg USING (user_id)
    LEFT JOIN biz_avg USING (business_id)
"""


@query(
    "q52_item_cf_predict",
    oracle=f"WITH {DUCK_AVGS}, {DUCK_R}, {DUCK_WEIGHTS}, {_PREDICT_ITEM_CF}",
)
def q52_item_cf_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full item-CF chain: weights → symmetrize → top-10 neighbors →
    weighted-average score Σw·r/Σ|w| → cold-start ladder (A9/W2/J7).

    Scale: neighbor table bounded at 10 rows/item; the two scoring joins
    shuffle on business and (user, business); everything upstream is the
    q51 plan."""
    train, test = train_test_split(derive_ratings(spark, sf_dir))
    user_avg, biz_avg = fit_avgs(train)
    weights = corated_weights(train, "business_id", "user_id", min_corated=2)
    neighbors = top_n_neighbors(weights, "pearson", n=10)
    return predict_item_cf(
        _test_pairs(test), train, neighbors, user_avg, biz_avg
    )


# --------------------------------------------------------------------------
_DUCK_R_USER = f"""
    r AS (SELECT user_id, business_id, {_AVG} AS stars
          FROM train GROUP BY user_id, business_id)
"""

_DUCK_WEIGHTS_USER = """
    stats AS (
        SELECT user_id, COUNT(*) AS n,
               SQRT(CAST(SUM(CAST(stars * stars AS DECIMAL(27,12))) AS DOUBLE)) AS norm
        FROM r GROUP BY user_id
    ),
    pair_agg AS (
        SELECT a.user_id AS e1, b.user_id AS e2,
               COUNT(*) AS n_common,
               CAST(SUM(CAST(a.stars AS DECIMAL(27,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(b.stars AS DECIMAL(27,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(a.stars * b.stars AS DECIMAL(27,12))) AS DOUBLE) AS dot,
               CAST(SUM(CAST(a.stars * a.stars AS DECIMAL(27,12))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(b.stars * b.stars AS DECIMAL(27,12))) AS DOUBLE) AS syy
        FROM r a JOIN r b
          ON a.business_id = b.business_id AND a.user_id < b.user_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    weights AS (
        SELECT e1, e2,
               ROUND(CASE WHEN n_common * sxx - sx * sx <= 0
                            OR n_common * syy - sy * sy <= 0 THEN 0.0
                          ELSE (n_common * dot - sx * sy)
                               / SQRT((n_common * sxx - sx * sx)
                                      * (n_common * syy - sy * sy)) END,
                     6) AS pearson
        FROM pair_agg
    )
"""

_PREDICT_USER_CF = """
    sym AS (
        SELECT e1, e2, pearson AS w FROM weights
        UNION ALL
        SELECT e2 AS e1, e1 AS e2, pearson AS w FROM weights
    ),
    topn AS (
        SELECT e1, e2, w FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY e1
                                         ORDER BY w DESC, e2 ASC) AS rn
            FROM sym
        ) WHERE rn <= 10
    ),
    tp AS (SELECT DISTINCT user_id, business_id FROM test),
    scored AS (
        SELECT tp.user_id, tp.business_id,
               CASE WHEN CAST(SUM(CAST(ABS(n.w) AS DECIMAL(38,12))) AS DOUBLE) > 0
                    THEN ROUND(
                        CAST(SUM(CAST(n.w * (r.stars - ua.user_avg)
                                      AS DECIMAL(38,12))) AS DOUBLE)
                        / CAST(SUM(CAST(ABS(n.w) AS DECIMAL(38,12))) AS DOUBLE), 6)
               END AS cf_delta
        FROM tp
        JOIN topn n ON tp.user_id = n.e1
        JOIN r ON r.user_id = n.e2 AND r.business_id = tp.business_id
        JOIN user_avg ua ON ua.user_id = n.e2
        GROUP BY tp.user_id, tp.business_id
    )
    SELECT tp.user_id, tp.business_id,
           COALESCE(
               CASE WHEN cf_delta IS NOT NULL AND user_avg IS NOT NULL
                    THEN ROUND(user_avg + cf_delta, 6) END,
               user_avg, biz_avg, 2.5) AS stars,
           CASE WHEN cf_delta IS NOT NULL AND user_avg IS NOT NULL THEN 'cf'
                WHEN user_avg IS NOT NULL THEN 'usr_avg'
                WHEN biz_avg IS NOT NULL THEN 'biz_avg'
                ELSE 'default' END AS decision
    FROM tp
    LEFT JOIN scored USING (user_id, business_id)
    LEFT JOIN user_avg USING (user_id)
    LEFT JOIN biz_avg USING (business_id)
"""


@query(
    "q53_user_cf_predict",
    oracle=f"WITH {DUCK_AVGS}, {_DUCK_R_USER}, {_DUCK_WEIGHTS_USER}, {_PREDICT_USER_CF}",
)
def q53_user_cf_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-based CF with mean-centered scoring ū + Σw(r−v̄)/Σ|w| (A10,
    ``predict_user_cf.py:216-227``) — the same engine transposed
    (entity = user, context = business)."""
    train, test = train_test_split(derive_ratings(spark, sf_dir))
    user_avg, biz_avg = fit_avgs(train)
    weights = corated_weights(train, "user_id", "business_id", min_corated=2)
    neighbors = top_n_neighbors(weights, "pearson", n=10)
    return predict_user_cf(
        _test_pairs(test), train, neighbors, user_avg, biz_avg
    )


# --------------------------------------------------------------------------
@query(
    "q54_baseline_rmse",
    oracle=f"""
    WITH {DUCK_AVGS},
    pred AS ({_BASELINE_SELECT}),
    joined AS (
        SELECT p.stars AS p, t.stars AS t
        FROM test t JOIN pred p USING (user_id, business_id)
    )
    SELECT COUNT(*) AS n_scored,
           ROUND(SQRT(
               CAST(SUM(CAST((p - t) * (p - t) AS DECIMAL(27,12))) AS DOUBLE)
               / COUNT(*)), 6) AS rmse
    FROM joined
    """,
)
def q54_baseline_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed RMSE of the baseline predictor on the held-out split —
    the evaluator (§5, ``scripts/evaluate.py:87-102``) as a query."""
    train, test = train_test_split(derive_ratings(spark, sf_dir))
    user_avg, biz_avg = fit_avgs(train)
    preds = predict_baseline(_test_pairs(test), user_avg, biz_avg)
    return rmse(preds, test).select("n_scored", "rmse")


# --------------------------------------------------------------------------
_DUCK_REVIEWS = """
    reviews AS (
        SELECT t.user_id, t.business_id, t.stars,
               p_name || ' ' || p_brand || ' ' || p_type AS text
        FROM train t JOIN part ON t.business_id = p_partkey
    )
"""

_DUCK_CONTENT = f"""
    {_DUCK_REVIEWS},
    btoks AS (
        SELECT business_id,
               unnest(list_filter(string_split(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' '),
                   t -> t != '')) AS token
        FROM reviews
    ),
    utoks AS (
        SELECT user_id,
               unnest(list_filter(string_split(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' '),
                   t -> t != '')) AS token
        FROM reviews
    ),
    tf AS (SELECT business_id, token, COUNT(*) AS tf FROM btoks GROUP BY 1, 2),
    dfq AS (SELECT token, COUNT(DISTINCT business_id) AS df FROM btoks
            GROUP BY 1 HAVING COUNT(DISTINCT business_id) > 1),
    nd AS (SELECT COUNT(DISTINCT business_id) AS n_docs FROM train),
    vocab AS (
        SELECT token FROM (
            SELECT tf.token, MAX(tf * log2(n_docs / df)) AS mx
            FROM tf JOIN dfq USING (token) CROSS JOIN nd
            GROUP BY tf.token
        ) ORDER BY mx DESC, token ASC LIMIT 50
    ),
    bprof AS (SELECT DISTINCT business_id, token
              FROM btoks JOIN vocab USING (token)),
    uprof AS (SELECT DISTINCT user_id, token
              FROM utoks JOIN vocab USING (token)),
    bnorm AS (SELECT business_id, SQRT(COUNT(*)) AS nb FROM bprof GROUP BY 1),
    unorm AS (SELECT user_id, SQRT(COUNT(*)) AS nu FROM uprof GROUP BY 1),
    tp AS (SELECT DISTINCT user_id, business_id FROM test),
    dots AS (
        SELECT tp.user_id, tp.business_id, COUNT(*) AS dot
        FROM tp
        JOIN uprof USING (user_id)
        JOIN bprof ON bprof.business_id = tp.business_id
                  AND bprof.token = uprof.token
        GROUP BY 1, 2
    ),
    cosines AS (
        SELECT tp.user_id, tp.business_id,
               ROUND(CASE WHEN dot IS NULL OR nu IS NULL OR nb IS NULL
                               OR nu = 0 OR nb = 0 THEN 0.0
                          ELSE dot / (nu * nb) END, 6) AS cos
        FROM tp
        LEFT JOIN dots USING (user_id, business_id)
        LEFT JOIN unorm USING (user_id)
        LEFT JOIN bnorm USING (business_id)
    )
"""


@query(
    "q55_content_predict",
    oracle=f"""
    WITH {DUCK_AVGS}, {_DUCK_CONTENT}
    SELECT c.user_id, c.business_id,
           COALESCE(
               CASE WHEN user_avg IS NOT NULL AND biz_avg IS NOT NULL
                    THEN cos * user_avg + (1.0 - cos) * biz_avg END,
               user_avg, biz_avg, 2.5) AS stars,
           CASE WHEN user_avg IS NOT NULL AND biz_avg IS NOT NULL THEN 'cos'
                WHEN user_avg IS NOT NULL THEN 'usr_avg'
                WHEN biz_avg IS NOT NULL THEN 'biz_avg'
                ELSE 'default' END AS decision
    FROM cosines c
    LEFT JOIN user_avg USING (user_id)
    LEFT JOIN biz_avg USING (business_id)
    """,
)
def q55_content_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-based predict (§3.1/§3.2): part text → TF-IDF → top-50
    vocabulary → one-hot long-form profiles → token-join cosine →
    geometric rule + cold-start ladder. Zero driver materialization —
    the reference's collected profile dicts
    (``content_based_model.py:402,448-478``) are two long-form DataFrames
    and the 'map-side join' is a real broadcast join."""
    train, test = train_test_split(derive_ratings(spark, sf_dir))
    part = load_tables(spark, sf_dir, ["part"])["part"]
    reviews = train.join(
        F.broadcast(part), train.business_id == part.p_partkey
    ).select(
        "user_id",
        "business_id",
        "stars",
        F.concat_ws(" ", "p_name", "p_brand", "p_type").alias("text"),
    )
    profiles = fit_content(reviews, top_k=50, min_df=1, variant="onehot")
    user_avg, biz_avg = fit_avgs(train)
    return predict_content(
        _test_pairs(test), profiles, user_avg, biz_avg, rule="geometric"
    )


# --------------------------------------------------------------------------
@query("q56_als_recommend")  # rows-only: iterative MLlib factorization
def q56_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS (M5) trained on the held-in split, scoring the held-out pairs
    with the cold-start ladder. Not SQL-expressible (iterative least
    squares) — driver records the weaker rows-only check."""
    train, test = train_test_split(derive_ratings(spark, sf_dir))
    user_avg, biz_avg = fit_avgs(train)
    model = train_als(train, rank=8, reg=0.2, max_iter=5)
    return predict_als(model, _test_pairs(test), user_avg, biz_avg)


# --------------------------------------------------------------------------
@query("q57_hybrid_recommend")  # rows-only: ALS + GBT blend
def q57_hybrid_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid (M8 shape): ALS(1 iter, mirroring ``train_hybrid.py:76-78``)
    + [ALS, UAVG, BAVG] features + distributed GBT blend regressor
    (documented substitution for the reference's driver-side sklearn MLP).
    """
    train, test = train_test_split(derive_ratings(spark, sf_dir))
    user_avg, biz_avg = fit_avgs(train)
    gmean = float(
        train.agg(F.avg("stars").alias("g")).collect()[0]["g"]
    )
    model = train_als(train, rank=8, reg=0.2, max_iter=1)
    # one label per (user, biz): mean stars via dedup_ratings — a pair
    # rated twice with different stars must not yield two conflicting
    # label rows (ADVICE r2 #4; .distinct() only removed exact dups)
    feats_train = hybrid_features(
        model, train.select("user_id", "business_id"), user_avg, biz_avg, gmean
    ).join(dedup_ratings(train, "business_id", "user_id"),
           ["user_id", "business_id"])
    reg = train_hybrid_regressor(feats_train)
    feats_test = hybrid_features(
        model, _test_pairs(test), user_avg, biz_avg, gmean
    )
    return predict_hybrid(reg, feats_test)


# --------------------------------------------------------------------------
# q58: extended content model (F4/F5/F6 + A11) — the business dimension is
# synthesized deterministically from `part` in the exact Yelp attribute
# string grammar, so the Spark side exercises the real no-eval parsers
# (quote-stripped ordinals, True/False booleans, {'k': bool} dicts) while
# the oracle, knowing the synthesis rule, states each encoded value
# directly. Weights stay small integers (with_text=False, normalize=False;
# cosine is scale-invariant — see fit_extended) so every decimal cast in
# the dot/norm aggregates is exact in both engines.
_DUCK_EXT = f"""
    biz AS (SELECT p_partkey AS business_id, p_brand, p_type, p_size
            FROM part),
    feats AS (
        SELECT business_id, 'cat:' || p_brand AS feature,
               CAST(1.0 AS DOUBLE) AS value FROM biz
        UNION ALL SELECT business_id, 'cat:' || p_type,
               CAST(1.0 AS DOUBLE) FROM biz
        UNION ALL SELECT business_id, 'attr:Alcohol',
               CAST(p_size % 3 + 1 AS DOUBLE) FROM biz
        UNION ALL SELECT business_id, 'attr:GoodForKids',
               CAST(CASE WHEN p_size % 2 = 0 THEN 2 ELSE 1 END AS DOUBLE)
               FROM biz
        UNION ALL SELECT business_id, 'attr:NoiseLevel',
               CAST(p_size % 4 + 1 AS DOUBLE) FROM biz
        UNION ALL SELECT business_id, 'attr:Music_dj',
               CAST(CASE WHEN p_size % 2 = 0 THEN 2 ELSE 1 END AS DOUBLE)
               FROM biz
        UNION ALL SELECT business_id, 'attr:Music_live',
               CAST(2.0 AS DOUBLE) FROM biz
    ),
    rated AS (SELECT DISTINCT user_id, business_id FROM train),
    uprof AS (
        SELECT r.user_id, f.feature, SUM(f.value) AS w
        FROM rated r JOIN feats f USING (business_id)
        GROUP BY 1, 2
    ),
    unorm AS (
        SELECT user_id,
               SQRT(CAST(SUM(CAST(w * w AS DECIMAL(27,12))) AS DOUBLE)) AS nu
        FROM uprof GROUP BY 1
    ),
    bnorm AS (
        SELECT business_id,
               SQRT(CAST(SUM(CAST(value * value AS DECIMAL(27,12))) AS DOUBLE))
                   AS nb
        FROM feats GROUP BY 1
    ),
    tp AS (SELECT DISTINCT user_id, business_id FROM test),
    dots AS (
        SELECT tp.user_id, tp.business_id,
               CAST(SUM(CAST(u.w * f.value AS DECIMAL(27,12))) AS DOUBLE)
                   AS dot
        FROM tp
        JOIN uprof u USING (user_id)
        JOIN feats f ON f.business_id = tp.business_id
                    AND f.feature = u.feature
        GROUP BY 1, 2
    ),
    cosines AS (
        SELECT tp.user_id, tp.business_id,
               ROUND(CASE WHEN dot IS NULL OR nu IS NULL OR nb IS NULL
                            OR nu = 0 OR nb = 0 THEN 0.0
                          ELSE dot / (nu * nb) END, 6) AS cos
        FROM tp
        LEFT JOIN dots USING (user_id, business_id)
        LEFT JOIN unorm USING (user_id)
        LEFT JOIN bnorm USING (business_id)
    )
"""


@query(
    "q58_extended_content_predict",
    oracle=f"""
    WITH {DUCK_AVGS}, {_DUCK_EXT}
    SELECT c.user_id, c.business_id,
           COALESCE(
               CASE WHEN user_avg IS NOT NULL AND biz_avg IS NOT NULL
                    THEN cos * user_avg + (1.0 - cos) * biz_avg END,
               user_avg, biz_avg, 2.5) AS stars,
           CASE WHEN user_avg IS NOT NULL AND biz_avg IS NOT NULL THEN 'cos'
                WHEN user_avg IS NOT NULL THEN 'usr_avg'
                WHEN biz_avg IS NOT NULL THEN 'biz_avg'
                ELSE 'default' END AS decision
    FROM cosines c
    LEFT JOIN user_avg USING (user_id)
    LEFT JOIN biz_avg USING (business_id)
    """,
)
def q58_extended_content_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended content model (§3.1e): category one-hots + no-eval
    attribute encodings (ordinal index+1, boolean int+1, nested-dict
    booleans) → element-wise-sum user profiles → long-form cosine →
    geometric rule + cold-start ladder. The attribute strings are
    synthesized from `part` in Yelp's literal grammar, so the q58 path
    runs the same parsers real Yelp data would."""
    from yelp_recommender_spark.models.extended_content import (
        ALCOHOL_VALUES,
        NOISE_VALUES,
        fit_extended,
        predict_extended,
    )

    train, test = train_test_split(derive_ratings(spark, sf_dir))
    part = load_tables(spark, sf_dir, ["part"])["part"]
    alcohol_vals = F.array(*[F.lit(v) for v in ALCOHOL_VALUES])
    noise_vals = F.array(*[F.lit(v) for v in NOISE_VALUES])
    q = F.lit("'")
    dj = F.when(F.col("p_size") % 2 == 0, F.lit("True")).otherwise(
        F.lit("False")
    )
    business = part.select(
        F.col("p_partkey").alias("business_id"),
        F.concat_ws(", ", "p_brand", "p_type").alias("categories"),
        F.create_map(
            F.lit("Alcohol"),
            F.concat(
                q,
                F.element_at(
                    alcohol_vals, (F.col("p_size") % 3 + 1).cast("int")
                ),
                q,
            ),
            F.lit("GoodForKids"),
            dj,
            F.lit("NoiseLevel"),
            F.concat(
                q,
                F.element_at(
                    noise_vals, (F.col("p_size") % 4 + 1).cast("int")
                ),
                q,
            ),
            F.lit("Music"),
            F.concat(F.lit("{'dj': "), dj, F.lit(", 'live': True}")),
        ).alias("attributes"),
    )
    model = fit_extended(
        train, business, with_text=False, normalize=False
    )
    user_avg, biz_avg = fit_avgs(train)
    return predict_extended(
        _test_pairs(test), model, user_avg, biz_avg, rule="geometric"
    )
