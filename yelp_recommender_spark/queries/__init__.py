"""Query catalog — the engine's public query surface.

Every operator family from SURVEY.md §2 (plus the beyond-reference
LLM-data-pipeline operators) is exposed as a named query over the driver's
synthetic tables, together with an ANSI-SQL oracle that DuckDB can run on
the same parquet files. Importing this package populates the registry.
"""

from yelp_recommender_spark.queries.registry import ORACLES, QUERIES

# populate the registry (import order = catalog order)
from yelp_recommender_spark.queries import core  # noqa: E402,F401
from yelp_recommender_spark.queries import events  # noqa: E402,F401
from yelp_recommender_spark.queries import text  # noqa: E402,F401
from yelp_recommender_spark.queries import dedup  # noqa: E402,F401
from yelp_recommender_spark.queries import similarity  # noqa: E402,F401
from yelp_recommender_spark.queries import recommender  # noqa: E402,F401
from yelp_recommender_spark.queries import pipeline  # noqa: E402,F401
from yelp_recommender_spark.queries import curation  # noqa: E402,F401
from yelp_recommender_spark.queries import advanced  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
