from yelp_recommender_spark.sources.readers import (
    read_csv,
    read_json,
    read_parquet,
    read_text,
)
from yelp_recommender_spark.sources.tables import load_tables, register_views
from yelp_recommender_spark.sources.writers import (
    write_json_lines,
    write_parquet,
    write_predictions,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_parquet",
    "read_text",
    "load_tables",
    "register_views",
    "write_json_lines",
    "write_parquet",
    "write_predictions",
]
