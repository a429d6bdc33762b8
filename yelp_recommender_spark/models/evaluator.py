"""RMSE evaluator (SURVEY.md §5; ``/root/reference/scripts/evaluate.py``).

Reference semantics preserved exactly:
- predictions join ground truth on (user_id, business_id);
- pairs with a missing or NaN prediction are EXCLUDED from the
  denominator (``evaluate.py:93-96``) — reported separately here instead
  of silently dropped;
- optional per-decision-rule breakdown (``evaluate.py:104-121``).

Everything returns small DataFrames (metric rows), never floats — the
evaluation itself is a distributed aggregation and composes with the rest
of a pipeline (e.g. RMSE per segment at 100 TB is the same plan plus a
groupBy key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yelp_recommender_spark.functions.exact_agg import dsum

KEYS = ["user_id", "business_id"]


def describe_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A13: the reference's RDD ``.stats()`` diagnostic
    (``/root/reference/scripts/als_recommender.py:165`` prints
    count/mean/stdev/max/min of the prediction column) as one DataFrame
    aggregation — long form, one row per numeric column:
    (column, n, mean, stddev, min, max), floats rounded to 6.

    NaNs are excluded per column (mirroring ``.stats()`` over a filtered
    RDD); ``stddev`` is the POPULATION deviation, matching
    ``StatCounter.stdev()`` (note ``df.describe()`` reports the sample
    deviation). All columns aggregate in a single job — one struct per
    column exploded from one agg row, not one scan per column."""
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.NumericType)
        ]
    structs = []
    for c in cols:
        v = F.col(c).cast("double")
        v = F.when(~F.isnan(v), v)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(v).alias("n"),
                F.round(F.avg(v), 6).alias("mean"),
                F.round(F.stddev_pop(v), 6).alias("stddev"),
                F.round(F.min(v), 6).alias("min"),
                F.round(F.max(v), 6).alias("max"),
            )
        )
    return (
        df.agg(F.array(*structs).alias("_s"))
        .select(F.explode("_s").alias("s"))
        .select("s.*")
    )


def _joined(predictions: DataFrame, truth: DataFrame, pred_col: str, true_col: str) -> DataFrame:
    p = predictions.select(*KEYS, F.col(pred_col).alias("_pred"))
    t = truth.select(*KEYS, F.col(true_col).alias("_true"))
    return t.join(p, KEYS, "left")


def rmse(
    predictions: DataFrame,
    truth: DataFrame,
    pred_col: str = "stars",
    true_col: str = "stars",
) -> DataFrame:
    """One row: (n_scored, n_missing, rmse).

    ``n_missing`` counts truth pairs with no / NaN prediction — the
    reference excludes them from RMSE (``evaluate.py:93-96``); surfacing
    the count keeps that exclusion observable. The squared-error sum uses
    the exact decimal accumulator so the metric is bit-stable across
    partitionings."""
    j = _joined(predictions, truth, pred_col, true_col)
    valid = F.col("_pred").isNotNull() & ~F.isnan("_pred")
    err2 = F.when(valid, (F.col("_pred") - F.col("_true")) ** 2)
    return j.agg(
        F.count(err2).alias("n_scored"),
        (F.count(F.lit(1)) - F.count(err2)).alias("n_missing"),
        F.round(F.sqrt(dsum(err2) / F.count(err2)), 6).alias("rmse"),
    )


def rmse_by_decision(
    predictions: DataFrame,
    truth: DataFrame,
    pred_col: str = "stars",
    true_col: str = "stars",
    decision_col: str = "decision",
) -> DataFrame:
    """Per-decision-rule RMSE breakdown (``evaluate.py:104-121``):
    (decision, n, rmse) — decisions are the cold-start tags
    {cos, usr_avg, biz_avg, default}."""
    p = predictions.select(
        *KEYS, F.col(pred_col).alias("_pred"), F.col(decision_col).alias("decision")
    )
    t = truth.select(*KEYS, F.col(true_col).alias("_true"))
    j = t.join(p, KEYS, "inner").filter(
        F.col("_pred").isNotNull() & ~F.isnan("_pred")
    )
    return j.groupBy("decision").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sqrt(dsum((F.col("_pred") - F.col("_true")) ** 2) / F.count(F.lit(1))),
            6,
        ).alias("rmse"),
    )
