"""Baseline averages predictor — the skeleton every reference model shares
(SURVEY.md §7 step 1): user/business mean stars + the cold-start coalesce
chain (``/root/reference/models/content_based_model.py:354-378,523-530``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.exact_agg import davg
from yelp_recommender_spark.functions.rules import DEFAULT_STARS


def fit_avgs(train: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(user_avg, biz_avg) mean-star tables (A1).

    Exact decimal means so downstream predictions hash identically across
    engines and partitionings. Two independent single-shuffle aggregates;
    both outputs are dimension-sized → broadcastable at predict time."""
    user_avg = train.groupBy("user_id").agg(davg("stars").alias("user_avg"))
    biz_avg = train.groupBy("business_id").agg(davg("stars").alias("biz_avg"))
    return user_avg, biz_avg


def predict_baseline(
    test: DataFrame,
    user_avg: DataFrame,
    biz_avg: DataFrame,
    default: float = DEFAULT_STARS,
) -> DataFrame:
    """(user_id, business_id, stars, decision): ½(ū+b̄) when both known,
    else ū, else b̄, else the 2.5 default — the reference's fallback
    ladder (``content_based_model.py:523-530``) as one expression chain.

    Scale: two broadcast left joins (avg tables ≪ fact), no shuffle of
    the test set."""
    both = (F.col("user_avg") + F.col("biz_avg")) / 2
    score = F.coalesce(both, F.col("user_avg"), F.col("biz_avg"), F.lit(default))
    decision = (
        F.when(F.col("user_avg").isNotNull() & F.col("biz_avg").isNotNull(), "both_avg")
        .when(F.col("user_avg").isNotNull(), "usr_avg")
        .when(F.col("biz_avg").isNotNull(), "biz_avg")
        .otherwise("default")
    )
    return (
        test.select("user_id", "business_id")
        .join(F.broadcast(user_avg), "user_id", "left")
        .join(F.broadcast(biz_avg), "business_id", "left")
        .select(
            "user_id",
            "business_id",
            score.alias("stars"),
            decision.alias("decision"),
        )
    )
