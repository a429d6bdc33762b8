"""Extended content model (SURVEY.md §3.1e;
``/root/reference/models/extended_content_model.py``) — business
category/attribute embeddings concatenated with TF-IDF profiles, user
profiles as the element-wise average of rated-business embeddings (A11).

Two deliberate fixes over the reference:

- **No ``eval``.** The reference decodes Yelp's stringified-Python-literal
  attribute values with ``eval()`` (``extended_content_model.py:15-48``) —
  code injection on data. Here the same grammar is parsed with Column
  algebra: quote-stripping for ordinals, literal ``when`` chains for
  booleans, and ``from_json`` after a Python→JSON literal rewrite for the
  nested dicts. Unknown/None values are skipped, as the reference does.
- **No driver dicts.** Profiles are long-form (id, feature, value) rows;
  the per-user average (``:156-169``, a driver loop there) is an
  explode-join-aggregate.

Encoding (documented divergence from the reference ``:7-8,17,22-48``):
ordinals here are ``index+1`` over severity-ordered value lists
(``none < beer_and_wine < full_bar``; ``quiet < average < loud <
very_loud``) and booleans are ``int(v)+1`` (False→1, True→2), reserving
0 for "absent" so a missing long-form row is distinguishable from a
present-but-false value. The reference uses 0-based indices over
differently-ordered lists (``['full_bar','beer_and_wine','none']``,
``['quiet','loud','average','very_loud']``), so individual ordinal
values differ; the feature *space* and sparsity semantics are the same.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# value lists from /root/reference/models/extended_content_model.py:7-8
ALCOHOL_VALUES = ["none", "beer_and_wine", "full_bar"]
NOISE_VALUES = ["quiet", "average", "loud", "very_loud"]

BOOL_ATTRS = ["GoodForDancing", "GoodForKids", "OutdoorSeating"]
DICT_ATTRS = ["Ambience", "GoodForMeal", "Music"]
# engagement counters from /root/reference/models/extended_content_model.py:82-97
USER_COUNTERS = [
    "funny",
    "useful",
    "cool",
    "compliment_cool",
    "compliment_cute",
    "compliment_funny",
    "compliment_hot",
    "compliment_list",
    "compliment_more",
    "compliment_note",
    "compliment_photos",
    "compliment_plain",
    "compliment_profile",
    "compliment_writer",
]


def _ordinal(value: Column, values: list[str]) -> Column:
    """'full_bar' (possibly quoted) → index+1; unknown → NULL (skipped)."""
    stripped = F.regexp_replace(value, "^'|'$", "")
    expr = F.lit(None).cast("double")
    for i, v in enumerate(values):
        expr = F.when(stripped == v, F.lit(float(i + 1))).otherwise(expr)
    return expr


def _boolean(value: Column) -> Column:
    """'True' → 2, 'False' → 1 (int(v)+1, reference ``:22-48``);
    'None'/unknown → NULL."""
    return (
        F.when(value == "True", F.lit(2.0))
        .when(value == "False", F.lit(1.0))
        .otherwise(F.lit(None).cast("double"))
    )


def _dict_entries(value: Column) -> Column:
    """Python-literal dict string → map<string, boolean> without eval:
    rewrite ``'`` → ``"``, ``True/False/None`` → JSON, then from_json."""
    jsonish = F.regexp_replace(value, "'", '"')
    jsonish = F.regexp_replace(jsonish, r"\bTrue\b", "true")
    jsonish = F.regexp_replace(jsonish, r"\bFalse\b", "false")
    jsonish = F.regexp_replace(jsonish, r"\bNone\b", "null")
    return F.from_json(jsonish, T.MapType(T.StringType(), T.BooleanType()))


def encode_business_features(
    business: DataFrame, categories_allow: list[str] | None = None
) -> DataFrame:
    """(business_id, feature, value) long-form embedding rows from the
    business dimension (categories + recognized attributes).

    ``categories`` is the Yelp comma-space string (split at
    ``extended_content_model.py:78``); an allowlist restricts the one-hot
    space (the reference's config category list)."""
    # ONE pass over the business dim, not one branch-union per feature
    # family: the former cat ∪ scalar-per-attr ∪ dict-per-attr shape
    # referenced the dimension ~10 times, and differently-projected
    # branches of one subtree never share a scan (the r9 scan-audit
    # pattern). Every row now emits its full feature array and one
    # explode flattens it — identical (business_id, feature, value)
    # multiset.
    def attr(name: str) -> Column:
        return F.col("attributes").getItem(name)

    def feat(feature: Column, value: Column) -> Column:
        return F.struct(feature.alias("feature"), value.alias("value"))

    empty = F.array().cast(
        "array<struct<feature:string,value:double>>"
    )

    cats_arr = F.filter(
        F.split(F.trim(F.coalesce(F.col("categories"), F.lit(""))), ", "),
        lambda c: c != "",
    )
    if categories_allow is not None:
        allow = F.array(*[F.lit(c) for c in categories_allow])
        cats_arr = F.filter(
            cats_arr, lambda c: F.array_contains(allow, c)
        )
    cat_feats = F.transform(
        cats_arr,
        lambda c: feat(F.concat(F.lit("cat:"), c), F.lit(1.0)),
    )

    scalar_feats = F.array(
        *[
            feat(F.lit(f"attr:{name}"), enc)
            for name, enc in (
                [("Alcohol", _ordinal(attr("Alcohol"), ALCOHOL_VALUES))]
                + [("NoiseLevel", _ordinal(attr("NoiseLevel"), NOISE_VALUES))]
                + [(b, _boolean(attr(b))) for b in BOOL_ATTRS]
            )
        ]
    )

    dict_feats = [
        F.coalesce(  # NULL attributes → no entries, not a NULL concat
            F.transform(
                F.map_entries(_dict_entries(attr(name))),
                lambda e: feat(
                    F.concat(F.lit(f"attr:{name}_"), e["key"]),
                    (e["value"].cast("int") + 1).cast("double"),
                ),
            ),
            empty,
        )
        for name in DICT_ATTRS
    ]

    all_feats = F.filter(
        F.concat(cat_feats, scalar_feats, *dict_feats),
        lambda s: s["value"].isNotNull(),
    )
    return business.select(
        "business_id", F.explode(all_feats).alias("_f")
    ).select(
        "business_id",
        F.col("_f.feature").alias("feature"),
        F.col("_f.value").alias("value"),
    )


def encode_user_features(user: DataFrame) -> DataFrame:
    """(user_id, feature, value) engagement-counter rows; missing columns
    default to 0 (``.get(field, 0)``, reference ``:109``) and zero rows
    are dropped (sparse representation)."""
    present = [c for c in USER_COUNTERS if c in user.columns]
    stack = F.array(
        *[
            F.struct(
                F.lit(f"usr:{c}").alias("feature"),
                F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias("value"),
            )
            for c in present
        ]
    )
    return (
        user.select("user_id", F.explode(stack).alias("_s"))
        .select("user_id", "_s.feature", "_s.value")
        .filter(F.col("value") != 0.0)
    )


def fit_extended(
    reviews: DataFrame,
    business: DataFrame,
    top_k: int = 200,
    categories_allow: list[str] | None = None,
    with_text: bool = True,
    normalize: bool = True,
) -> dict[str, DataFrame]:
    """Business embedding = [categories | attributes | TF-IDF] long rows
    (``extended_content_model.py:129-137``); user profile = element-wise
    mean of the user's rated-business embeddings (``:156-169``, A11).

    ``with_text=False`` drops the TF-IDF block (categories + attributes
    only — every weight is then a small integer, so the profile sums are
    exact in any summation order). ``normalize=False`` keeps the raw
    element-wise sums instead of dividing by the rated-business count:
    cosine similarity is invariant to uniformly scaling one vector, so
    downstream predictions are mathematically identical, and with
    ``with_text=False`` the weights stay integers — the
    oracle-reproducibility property the q58 catalog entry relies on
    (non-integer weights would hit engine-specific rounding when cast to
    DECIMAL inside the dot/norm aggregates).

    The per-user mean divides the element-wise *sum* by the user's
    rated-business count — matching the reference's ``average_vects``
    (``:156-169``), where a feature absent from a rated business
    contributes 0 to that coordinate (a category in 1 of 3 rated
    businesses averages to 1/3, not 1).

    Scale: the user average is explode(ratings ⋈ biz-embedding) →
    groupBy(user, feature) sum ⋈ per-user count — fully distributed; the
    reference held every profile in a driver dict."""
    biz_embedding = encode_business_features(business, categories_allow)
    if with_text:
        from yelp_recommender_spark.models.content_based import fit_content

        tfidf_profiles = fit_content(reviews, top_k=top_k, variant="continuous")
        tfidf_rows = tfidf_profiles["biz_profile"].select(
            "business_id",
            F.concat(F.lit("tok:"), F.col("token")).alias("feature"),
            F.col("w").alias("value"),
        )
        biz_embedding = biz_embedding.unionByName(tfidf_rows)

    # both returned tables are consumed twice downstream (dot products
    # + norms in profile_cosines), and user_profile's lineage re-reads
    # biz_embedding — without pins the business encode ran 4× in the
    # executed q58 plan (r10 executed-plan audit; fit_content got the
    # same treatment). Session cache registry, boundary-cleared.
    from yelp_recommender_spark.cache import register_persist

    biz_embedding = register_persist(biz_embedding)
    rated = reviews.select("user_id", "business_id").distinct()
    sums = rated.join(biz_embedding, "business_id").groupBy(
        "user_id", "feature"
    ).agg(F.sum("value").alias("_sum"))
    if not normalize:
        user_profile = sums.select(
            "user_id", "feature", F.col("_sum").alias("value")
        )
    else:
        n_rated = rated.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("_n_rated")
        )
        user_profile = sums.join(n_rated, "user_id").select(
            "user_id",
            "feature",
            (F.col("_sum") / F.col("_n_rated")).alias("value"),
        )
    return {
        "biz_embedding": biz_embedding,
        "user_profile": register_persist(user_profile),
    }


def predict_extended(
    test: DataFrame,
    model: dict[str, DataFrame],
    user_avg: DataFrame,
    biz_avg: DataFrame,
    rule: str = "geometric",
) -> DataFrame:
    """Cosine over the concatenated embedding space + decision rules —
    reuses the content model's long-form cosine and rule ladder."""
    from yelp_recommender_spark.models.content_based import (
        predict_content,
    )

    profiles = {
        "user_profile": model["user_profile"].select(
            "user_id", F.col("feature").alias("token"), F.col("value").alias("w")
        ),
        "biz_profile": model["biz_embedding"].select(
            "business_id", F.col("feature").alias("token"), F.col("value").alias("w")
        ),
        "vocab": None,
    }
    return predict_content(test, profiles, user_avg, biz_avg, rule=rule)
