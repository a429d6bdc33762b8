"""Decision rules + cold-start fallback chains (SURVEY.md §2.8 F13, §2.2 P8).

The reference's prediction core (``/root/reference/models/
content_based_model.py:509-530``) scores a (user, business) pair as:

- linear   : ū + slope·(cos − bias)
- geometric: cos·ū + (1 − cos)·b̄
- constant : 5·cos

with cold-start fallbacks: user unseen → b̄; business unseen → ū; both
unseen → DEFAULT_STARS (2.5). Each rule is a pure column expression; the
fallback chain is a ``coalesce`` over left-join results, tagged with the
``decision`` label the evaluator's per-rule RMSE breakdown expects
(``/root/reference/scripts/evaluate.py:104-121``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_STARS = 2.5


def linear_rule(cos: Column, user_avg: Column, slope: float = 0.7, bias: float = 0.5) -> Column:
    return user_avg + slope * (cos - bias)


def geometric_rule(cos: Column, user_avg: Column, biz_avg: Column) -> Column:
    return cos * user_avg + (1.0 - cos) * biz_avg


def constant_rule(cos: Column) -> Column:
    return 5.0 * cos


def clip_stars(score: Column, lo: float = 1.0, hi: float = 5.0) -> Column:
    return F.least(F.greatest(score, F.lit(lo)), F.lit(hi))


def cold_start_score(
    model_score: Column,
    user_avg: Column,
    biz_avg: Column,
    default: float = DEFAULT_STARS,
) -> Column:
    """coalesce(model, ū, b̄, default) — the J9 left-join-with-default
    pattern as one expression."""
    return F.coalesce(model_score, user_avg, biz_avg, F.lit(default))


def decision_tag(
    model_score: Column, user_avg: Column, biz_avg: Column
) -> Column:
    """Label which branch produced the score, for per-rule RMSE."""
    return (
        F.when(model_score.isNotNull(), F.lit("cos"))
        .when(user_avg.isNotNull(), F.lit("usr_avg"))
        .when(biz_avg.isNotNull(), F.lit("biz_avg"))
        .otherwise(F.lit("default"))
    )
