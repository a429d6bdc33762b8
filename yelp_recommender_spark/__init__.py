"""yelp_recommender_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame/SQL/Catalyst) engine with the
query and data-processing capabilities of the reference project
``jorgeviz/yelp_recommender`` (four recommender families: content-based
TF-IDF, extended content, item/user collaborative filtering with
MinHash-LSH candidate generation, and ALS + hybrid), extended with the
operators a large-scale training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, text analysis, multimodal column plumbing, and
Structured Streaming variants.

Design stance (see SURVEY.md §7):

- DataFrame/SQL only — no RDD lambdas; every operator is a composable
  function ``DataFrame -> DataFrame`` built from ``pyspark.sql.functions``
  so Catalyst gets full visibility (predicate pushdown, column pruning,
  whole-stage codegen, AQE).
- Fixed ``StructType`` schemas; Parquet for all persisted state.
- Broadcast hints for dimension joins; explicit salting helpers for skew;
  LSH instead of cartesian for pair generation at scale.
- Python only at the Arrow boundary (pandas UDFs) where Spark ML has a
  genuine gap (e.g. the hybrid MLP regressor).
"""

from yelp_recommender_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
