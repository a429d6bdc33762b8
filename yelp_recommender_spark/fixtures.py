"""Deterministic Yelp-shaped fixtures (FIXTURES.md §1-§5) for
recommender-semantics tests: small enough to hand-verify, covering the
reference's edge cases — co-rated pairs, cold starts, duplicate (user,
biz) ratings, zero-variance Pearson pairs, eval-style attribute strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRAIN_REVIEWS = [
    # (user_id, business_id, stars, text) — controlled vocabulary + stopwords
    ("u1", "b1", 5.0, "Great tacos and great salsa! The BEST tacos."),
    ("u1", "b2", 3.0, "Decent burgers, the fries were soggy."),
    ("u1", "b3", 1.0, "Terrible pizza; burnt crust."),
    ("u2", "b1", 4.0, "Tacos were great, salsa was fresh."),
    ("u2", "b2", 2.0, "Burgers bland. Fries cold."),
    ("u2", "b3", 2.0, "Pizza was meh, soggy crust."),
    ("u3", "b1", 5.0, "Best tacos in town! Fresh salsa."),
    ("u3", "b2", 5.0, "Burgers amazing, fries crispy."),
    # u4 rates b1/b2 identically → zero-variance Pearson vs anyone
    ("u4", "b1", 3.0, "tacos ok"),
    ("u4", "b2", 3.0, "burgers ok"),
    # duplicate (user, biz) pair (allowed per FIXTURES.md §1)
    ("u4", "b2", 5.0, "burgers actually amazing on second visit"),
    # single-review user + single-review business (cold-start edges)
    ("u5", "b4", 4.0, "Quiet coffee shop, great espresso."),
]

# test pairs: seen/seen, seen-user/unseen-biz, unseen-user/seen-biz, both unseen
TEST_PAIRS = [
    ("u1", "b2"),
    ("u1", "b_new"),
    ("u_new", "b1"),
    ("u_new", "b_new"),
    ("u5", "b1"),
]

TEST_TRUTH = [
    ("u1", "b2", 3.0),
    ("u1", "b_new", 4.0),
    ("u_new", "b1", 5.0),
    ("u_new", "b_new", 1.0),
    ("u5", "b1", 4.0),
]

BUSINESSES = [
    # (business_id, categories, attributes) — attribute values are the
    # exact stringified-Python-literal grammar Yelp ships (FIXTURES.md §4)
    (
        "b1",
        "Restaurants, Mexican, Bars",
        {
            "Alcohol": "'full_bar'",
            "GoodForKids": "True",
            "NoiseLevel": "'loud'",
            "GoodForMeal": "{'dessert': False, 'lunch': True, 'dinner': True}",
            "Music": "{'dj': False, 'live': True}",
            "OutdoorSeating": "None",
        },
    ),
    (
        "b2",
        "Restaurants, Burgers",
        {
            "Alcohol": "'beer_and_wine'",
            "GoodForKids": "False",
            "NoiseLevel": "'average'",
            "Ambience": "{'romantic': False, 'casual': True}",
            "GoodForDancing": "False",
        },
    ),
    ("b3", "Restaurants, Pizza", None),  # null attributes guard (:11-12)
    ("b4", "Coffee & Tea, UnknownCategory", {"NoiseLevel": "'quiet'"}),
    ("b5", "", {"Alcohol": "'nonsense_value'"}),  # empty cats, unknown ordinal
]

USERS = [
    # (user_id, funny, useful, cool, compliment_cool) — others absent→0
    ("u1", 10, 20, 5, 2),
    ("u2", 0, 1, 0, 0),
    ("u3", 3, 0, 7, 1),
    ("u4", 0, 0, 0, 0),
    ("u5", 1, 1, 1, 1),
]


def train_reviews_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        TRAIN_REVIEWS, "user_id string, business_id string, stars double, text string"
    )


def test_pairs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TEST_PAIRS, "user_id string, business_id string")


def test_truth_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        TEST_TRUTH, "user_id string, business_id string, stars double"
    )


def businesses_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        BUSINESSES,
        "business_id string, categories string, attributes map<string,string>",
    )


def users_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        USERS,
        "user_id string, funny long, useful long, cool long, compliment_cool long",
    )
