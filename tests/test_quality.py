"""Model-quality regression gates for the rows-only recommender entries
(q56/q57 have no SQL oracle — iterative MLlib — so without these a
silent quality regression would pass every check). The synthetic stars
are pseudo-random in [1,5] (std ≈ 1.41), so no model can beat noise by
much here; the gates catch the failure classes that matter — NaN/null
predictions, unscored pairs, unscaled outputs, constant garbage —
measured r4 values: baseline 1.392, ALS 1.534, hybrid 1.485."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)

RMSE_CEILING = 1.75


@pytest.mark.parametrize(
    "qname",
    ["q50_baseline_predict", "q56_als_recommend", "q57_hybrid_recommend"],
)
def test_recommender_quality_gates(spark, qname):  # noqa: F811
    from yelp_recommender_spark.models.evaluator import rmse
    from yelp_recommender_spark.models.ratings import (
        derive_ratings,
        train_test_split,
    )
    from yelp_recommender_spark.queries import QUERIES

    _, test = train_test_split(derive_ratings(spark, SF_DIR))
    preds = QUERIES[qname](spark, SF_DIR)
    rows = preds.collect()
    assert all(
        r.stars is not None and math.isfinite(r.stars) for r in rows
    ), f"{qname}: non-finite predictions"
    # predictions must live near the label scale — an unscaled or
    # exploding model fails here long before RMSE moves
    assert all(-1.0 <= r.stars <= 7.0 for r in rows), f"{qname}: out of scale"

    m = rmse(preds, test).head()
    assert m.n_missing == 0, f"{qname}: {m.n_missing} unscored truth pairs"
    assert m.rmse <= RMSE_CEILING, f"{qname}: rmse {m.rmse}"
