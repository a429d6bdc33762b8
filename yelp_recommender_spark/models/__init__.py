"""Recommender model library — the reference's four model families
(SURVEY.md §2.9, §3) restated as composable DataFrame transforms.

Every model is a set of pure functions ``DataFrame -> DataFrame`` over the
Yelp-shaped schema (user_id, business_id, stars[, text]); no driver-side
dicts, no RDDs, no collects (the one exception is the ANN index broadcast
in :mod:`~yelp_recommender_spark.operators.ann`). Model state (profiles,
weights, factors) lives in DataFrames persisted as Parquet.
"""

from yelp_recommender_spark.models.baseline import fit_avgs, predict_baseline
from yelp_recommender_spark.models.evaluator import rmse, rmse_by_decision

__all__ = [
    "fit_avgs",
    "predict_baseline",
    "rmse",
    "rmse_by_decision",
]
