"""Content-based model (SURVEY.md §3.1/§3.2;
``/root/reference/models/content_based_model.py``) — TF-IDF business
profiles, user profiles from the user's own review text, cosine scoring
with the decision-rule library.

Profiles are kept in *long relational form* — (id, token[, w]) rows —
instead of the reference's driver-side dense/sparse vectors
(``content_based_model.py:209-258,402``): the cosine between two profiles
is then an equi-join on the token plus one aggregate, which distributes,
broadcasts the (vocabulary-sized) dimension tables, and stays
oracle-checkable. A VectorUDT materialization is only ever needed at an
MLlib boundary (none in this model).

Variants (F14): ``onehot`` — presence/absence (cosine reduces to
|common| / √(|u|·|b|), pure integer arithmetic + one sqrt); ``continuous``
— TF-IDF weights on the business side and TF·IDF on the user side
(documented divergence: the reference reuses its business-corpus
IDF for user encoding too, ``content_based_model.py:251-257``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.rules import (
    DEFAULT_STARS,
    constant_rule,
    geometric_rule,
    linear_rule,
)
from yelp_recommender_spark.functions.text import tokens_col
from yelp_recommender_spark.operators.tfidf import tfidf, top_k_vocabulary


def _tokens_long(reviews: DataFrame, id_col: str) -> DataFrame:
    return reviews.select(
        id_col, F.explode(tokens_col("text")).alias("token")
    )


def fit_content(
    reviews: DataFrame,
    top_k: int = 200,
    min_df: int = 1,
    variant: str = "onehot",
) -> dict[str, DataFrame]:
    """Fit TF-IDF profiles from (user_id, business_id, stars, text).

    Business documents are the concatenation of all the business's review
    tokens (``get_revs``, ``content_based_model.py:86-106``); the global
    top-K vocabulary is selected by max TF-IDF with df > min_df pruning
    (A5/W1/P3) and a deterministic (value desc, token asc) tie-break —
    the reference's collection-order ties are not reproducible (SURVEY §7
    risk register).

    Returns {"vocab", "biz_profile", "user_profile"} DataFrames; profiles
    are (id, token, w) long form.

    Cache discipline (r10 executed-plan audit): ``scored`` is consumed
    by the vocabulary cut AND each profile variant, and each returned
    profile is consumed twice downstream (dot products + norms in
    :func:`profile_cosines`) — without pins, every reference re-runs
    the tokenize + TF-IDF lineage from the raw reviews (the
    content-predict plan re-scanned the fact tables 26×). ``scored``
    and both profiles are persisted via the session registry;
    ``vocab`` rides inside them as a broadcast.
    """
    from yelp_recommender_spark.cache import register_persist

    # reviews is consumed three times (corpus count, business tokens,
    # user tokens) — pin it so the upstream join (ratings ⋈ part text)
    # runs once, not per consumer
    reviews = register_persist(reviews)
    biz_tokens = _tokens_long(reviews, "business_id")
    n_biz = reviews.select("business_id").distinct().count()
    scored = register_persist(
        tfidf(biz_tokens, id_col="business_id", n_docs=n_biz, min_df=min_df)
    )
    vocab = top_k_vocabulary(scored, k=top_k).select("token")

    user_tokens = _tokens_long(reviews, "user_id")
    if variant == "onehot":
        biz_prof = (
            scored.join(F.broadcast(vocab), "token")
            .select("business_id", "token")
            .distinct()
            .withColumn("w", F.lit(1.0))
        )
        user_prof = (
            user_tokens.join(F.broadcast(vocab), "token")
            .distinct()
            .withColumn("w", F.lit(1.0))
        )
    elif variant == "continuous":
        biz_prof = scored.join(F.broadcast(vocab), "token").select(
            "business_id", "token", F.round("tfidf", 6).alias("w")
        )
        # user side: TF over the user's reviews × the business-corpus IDF
        df_tbl = scored.select("token", "df").distinct()
        user_tf = user_tokens.groupBy("user_id", "token").agg(
            F.count(F.lit(1)).alias("tf")
        )
        user_prof = (
            user_tf.join(F.broadcast(vocab), "token")
            .join(F.broadcast(df_tbl), "token")
            .select(
                "user_id",
                "token",
                F.round(
                    F.col("tf") * F.log2(F.lit(float(n_biz)) / F.col("df")), 6
                ).alias("w"),
            )
        )
    else:
        raise ValueError(f"unknown variant {variant!r}")
    return {
        "vocab": vocab,
        "biz_profile": register_persist(biz_prof),
        "user_profile": register_persist(user_prof),
    }


def profile_cosines(
    pairs: DataFrame, user_profile: DataFrame, biz_profile: DataFrame
) -> DataFrame:
    """cos(user, business) for each (user_id, business_id) pair, via a
    token equi-join over long-form profiles (F8 without vectors).

    Scale: dot products distribute on the token key; the norm tables are
    id-sized aggregates broadcast back. Pairs with no common token get
    cos = 0 (left join + coalesce)."""
    up = user_profile.select("user_id", "token", F.col("w").alias("_wu"))
    bp = biz_profile.select("business_id", "token", F.col("w").alias("_wb"))

    dots = (
        pairs.join(up, "user_id")
        .join(bp, ["business_id", "token"])
        .groupBy("user_id", "business_id")
        .agg(
            F.sum((F.col("_wu") * F.col("_wb")).cast("decimal(27,12)"))
            .cast("double")
            .alias("_dot")
        )
    )
    unorm = user_profile.groupBy("user_id").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(27,12)")).cast("double")
        ).alias("_nu")
    )
    bnorm = biz_profile.groupBy("business_id").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(27,12)")).cast("double")
        ).alias("_nb")
    )
    return (
        pairs.join(dots, ["user_id", "business_id"], "left")
        .join(F.broadcast(unorm), "user_id", "left")
        .join(F.broadcast(bnorm), "business_id", "left")
        .select(
            "user_id",
            "business_id",
            F.round(
                F.when(
                    F.col("_dot").isNull()
                    | F.col("_nu").isNull()
                    | F.col("_nb").isNull()
                    | (F.col("_nu") == 0)
                    | (F.col("_nb") == 0),
                    F.lit(0.0),
                ).otherwise(F.col("_dot") / (F.col("_nu") * F.col("_nb"))),
                6,
            ).alias("cos"),
        )
    )


def predict_content(
    test: DataFrame,
    profiles: dict[str, DataFrame],
    user_avg: DataFrame,
    biz_avg: DataFrame,
    rule: str = "geometric",
    slope: float = 0.7,
    bias: float = 0.5,
    default: float = DEFAULT_STARS,
) -> DataFrame:
    """Score test pairs: cosine + decision rule + cold-start ladder
    (``content_based_model.py:490-539``). Output: (user_id, business_id,
    stars, decision).

    The rule applies only when both profiles and both averages exist;
    otherwise the ladder ū → b̄ → default (decision-tagged for the
    per-rule RMSE breakdown)."""
    pairs = test.select("user_id", "business_id")
    cosines = profile_cosines(
        pairs, profiles["user_profile"], profiles["biz_profile"]
    )
    j = (
        cosines.join(F.broadcast(user_avg), "user_id", "left")
        .join(F.broadcast(biz_avg), "business_id", "left")
    )
    cos = F.col("cos")
    ua, ba = F.col("user_avg"), F.col("biz_avg")
    if rule == "geometric":
        scored = geometric_rule(cos, ua, ba)
    elif rule == "linear":
        scored = linear_rule(cos, ua, slope=slope, bias=bias)
    elif rule == "constant":
        scored = constant_rule(cos)
    else:
        raise ValueError(f"unknown rule {rule!r}")
    model_ok = ua.isNotNull() & ba.isNotNull()
    decision = (
        F.when(model_ok, "cos")
        .when(ua.isNotNull(), "usr_avg")
        .when(ba.isNotNull(), "biz_avg")
        .otherwise("default")
    )
    # NOT rounded: every input (cos, ū, b̄) is already bit-identical across
    # engines, so the rule's IEEE arithmetic is too — rounding here would
    # *introduce* divergence (round-impl disagreement on boundary doubles).
    return j.select(
        "user_id",
        "business_id",
        F.coalesce(F.when(model_ok, scored), ua, ba, F.lit(default)).alias("stars"),
        decision.alias("decision"),
    )
