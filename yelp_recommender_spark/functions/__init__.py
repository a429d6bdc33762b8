from yelp_recommender_spark.functions.exact_agg import dsum, davg, dsum_expr
from yelp_recommender_spark.functions.similarity import (
    cosine_arrays,
    dot_arrays,
    jaccard_arrays,
    l2_norm,
)
from yelp_recommender_spark.functions.text import (
    pad_punctuation,
    tokenize,
    tokens_col,
)

__all__ = [
    "dsum",
    "davg",
    "dsum_expr",
    "cosine_arrays",
    "dot_arrays",
    "jaccard_arrays",
    "l2_norm",
    "pad_punctuation",
    "tokenize",
    "tokens_col",
]
