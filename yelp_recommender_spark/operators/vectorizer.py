"""Feature-hashing document vectorizer — the "hashing trick"
(Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning", ICML 2009; the design behind sklearn's HashingVectorizer and
Spark ML's HashingTF): project an unbounded vocabulary into a fixed
``n_dims``-dimensional vector by hashing each term to a dimension, with
a second hash bit choosing the sign so collisions cancel in expectation
instead of accumulating.

This is the bridge from the text surface to the similarity surface:
documents → fixed-width embeddings → the whole ANN ladder
(:mod:`~yelp_recommender_spark.operators.ann`,
:mod:`~yelp_recommender_spark.operators.pq`) applies to TEXT near-dup
detection with no trained embedding model in the loop.

Why not Spark ML's ``HashingTF``: it hashes with murmur3, which no SQL
oracle reproduces. The hash family here is the engine's portable md5
convention (``functions/sampling.py``, ``operators/dedup.py``):
dimension = first 16 md5 bits mod n_dims, sign = parity of the next 4 —
any engine with md5 computes the EXACT same vectors, so q87 gates the
full vectorization against DuckDB (weights included, via exact decimal
sums).

Scale: everything is hash-aggregation column algebra — no driver state,
no vocabulary dictionary (that is the point of the hashing trick: the
vocabulary never needs to be collected, broadcast, or even counted),
one shuffle per aggregation on uniform keys. No reference counterpart
(the reference's TF-IDF keeps an explicit driver-side vocabulary dict,
``/root/reference/models/content_based_model.py:402``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.exact_agg import dsum
from yelp_recommender_spark.operators.tfidf import tfidf

__all__ = [
    "hashed_dim",
    "hashed_sign",
    "hashed_tfidf_long",
    "assemble_embeddings",
]


def hashed_dim(term: Column | str, n_dims: int = 64) -> Column:
    """Dimension index in [0, n_dims): first 16 md5 bits of the term,
    mod n_dims. ``n_dims`` ≤ 65536 (the hash width)."""
    if not 1 <= n_dims <= 65536:
        raise ValueError(f"n_dims must be in [1, 65536], got {n_dims}")
    c = F.col(term) if isinstance(term, str) else term
    return (
        F.conv(F.substring(F.md5(c), 1, 4), 16, 10).cast("int")
        % F.lit(n_dims)
    )


def hashed_sign(term: Column | str) -> Column:
    """±1 from the parity of the 5th md5 hex digit — the signed-hashing
    bit that makes collision noise zero-mean (Weinberger et al. §3)."""
    c = F.col(term) if isinstance(term, str) else term
    return (
        F.lit(1)
        - F.lit(2)
        * (F.conv(F.substring(F.md5(c), 5, 1), 16, 10).cast("int") % 2)
    ).cast("int")


def hashed_tfidf_long(
    tokens_long: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "token",
    n_dims: int = 64,
    n_docs: int | DataFrame | None = None,
) -> DataFrame:
    """(id, dim, weight) — the hashed TF-IDF vector in long form:
    weight(d) = Σ_{terms hashing to d} sign(term) · tf · log₂(N/df),
    summed exactly (decimal) and rounded to 6, so the vectors hash
    identically in any engine and under any partitioning. Long form IS
    the sparse representation (SURVEY §2.8 F15 — Parquet long-form by
    design); :func:`assemble_embeddings` densifies for the ANN
    operators."""
    scored = tfidf(tokens_long, id_col, token_col, n_docs=n_docs)
    return (
        scored.select(
            id_col,
            hashed_dim(token_col, n_dims).alias("dim"),
            (hashed_sign(token_col) * F.col("tfidf")).alias("_w"),
        )
        .groupBy(id_col, "dim")
        .agg(F.round(dsum("_w"), 6).alias("weight"))
    )


def assemble_embeddings(
    long_df: DataFrame,
    id_col: str = "doc_id",
    n_dims: int = 64,
    dim_col: str = "dim",
    weight_col: str = "weight",
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding array<double>) — densify the long form (absent
    dims are 0.0) for consumption by the ANN family. One hash
    aggregation; the map→array expansion is per-row column algebra."""
    packed = long_df.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(dim_col), F.col(weight_col)))
        ).alias("_m")
    )
    return packed.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(n_dims - 1)),
            lambda i: F.coalesce(F.element_at("_m", i), F.lit(0.0)),
        ).alias(out_col),
    )
