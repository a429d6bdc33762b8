"""Schema registry.

The reference has no schema system — every schema is implied by dict-key
access over JSON lines (SURVEY.md §1.2). Here every table gets a fixed
``StructType`` so JSON scans never pay inference (a full extra pass at
100 TB) and Parquet scans can prune columns.

Yelp-shaped schemas cite the reference accesses that imply them:

- review: ``/root/reference/models/content_based_model.py:72-77,371-375``
- business: ``/root/reference/models/extended_content_model.py:10-49,76-79``
- user: ``/root/reference/models/extended_content_model.py:82-97``
- predictions: ``/root/reference/models/content_based_model.py:534-539``
- CF weights: ``/root/reference/scripts/train_user_cf.py:335-344``
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- Yelp model

REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("business_id", T.StringType(), False),
        T.StructField("stars", T.DoubleType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

TEST_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("business_id", T.StringType(), False),
    ]
)

# `attributes` values arrive as stringified Python literals in the Yelp dump
# ("'full_bar'", "True", "{'dj': False}"); we keep them as strings at scan
# time and decode with safe column expressions, never eval()
# (cf. /root/reference/models/extended_content_model.py:10-49).
BUSINESS_SCHEMA = T.StructType(
    [
        T.StructField("business_id", T.StringType(), False),
        T.StructField("categories", T.StringType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

USER_COMPLIMENT_FIELDS = [
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

USER_ENGAGEMENT_FIELDS = ["funny", "useful", "cool", *USER_COMPLIMENT_FIELDS]

USER_SCHEMA = T.StructType(
    [T.StructField("user_id", T.StringType(), False)]
    + [T.StructField(f, T.LongType(), True) for f in USER_ENGAGEMENT_FIELDS]
)

PREDICTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("business_id", T.StringType(), False),
        T.StructField("stars", T.DoubleType(), True),
        T.StructField("decision", T.StringType(), True),
    ]
)

PAIR_WEIGHT_SCHEMA = T.StructType(
    [
        T.StructField("id1", T.StringType(), False),
        T.StructField("id2", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)

# ------------------------------------------------------- synthetic testdata

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), False),
            T.StructField("r_name", T.StringType(), False),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), False),
            T.StructField("n_name", T.StringType(), False),
            T.StructField("n_regionkey", T.IntegerType(), False),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), False),
            T.StructField("c_name", T.StringType(), False),
            T.StructField("c_nationkey", T.IntegerType(), False),
            T.StructField("c_acctbal", T.DoubleType(), False),
            T.StructField("c_mktsegment", T.StringType(), False),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), False),
            T.StructField("s_name", T.StringType(), False),
            T.StructField("s_nationkey", T.IntegerType(), False),
            T.StructField("s_acctbal", T.DoubleType(), False),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), False),
            T.StructField("p_name", T.StringType(), False),
            T.StructField("p_brand", T.StringType(), False),
            T.StructField("p_type", T.StringType(), False),
            T.StructField("p_size", T.IntegerType(), False),
            T.StructField("p_retailprice", T.DoubleType(), False),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), False),
            T.StructField("o_custkey", T.LongType(), False),
            T.StructField("o_orderstatus", T.StringType(), False),
            T.StructField("o_totalprice", T.DoubleType(), False),
            T.StructField("o_orderdate", T.TimestampType(), False),
            T.StructField("o_orderpriority", T.StringType(), False),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), False),
            T.StructField("l_partkey", T.LongType(), False),
            T.StructField("l_suppkey", T.LongType(), False),
            T.StructField("l_linenumber", T.IntegerType(), False),
            T.StructField("l_quantity", T.DoubleType(), False),
            T.StructField("l_extendedprice", T.DoubleType(), False),
            T.StructField("l_discount", T.DoubleType(), False),
            T.StructField("l_tax", T.DoubleType(), False),
            T.StructField("l_returnflag", T.StringType(), False),
            T.StructField("l_linestatus", T.StringType(), False),
            T.StructField("l_shipdate", T.TimestampType(), False),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
            T.StructField("label", T.IntegerType(), False),
        ]
    ),
}
