"""TF-IDF as DataFrame aggregations (SURVEY.md §2.4 A2-A5, §2.5 W1/W4).

Reference pipeline (``/root/reference/models/content_based_model.py``):
document frequency via ``flatMapValues(set) → groupByKey → len``
(``:108-127``, collected to a driver dict), term frequency via per-doc
``Counter`` (``:146-156``), tfidf = tf · log₂(N/df) (``:157-165``), then a
*global* top-K vocabulary by max tfidf (``:166-176``).

Spark-native restatement — three hash aggregates and a window, all with
map-side partial aggregation (which the reference's groupByKey never got):

    explode(tokens) → groupBy(term)        agg countDistinct(doc)   (DF)
                    → groupBy(doc, term)   agg count(*)             (TF)
                    → join(DF) + column expr                        (TFIDF)
                    → groupBy(term) max → TakeOrderedAndProject     (vocab)

The DF table is tiny (vocabulary-sized) → broadcast join back onto the
(doc, term) TF table; at 100 TB the vocabulary still fits in memory after
the ``min_df`` prune, and nothing ever touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yelp_recommender_spark.operators.topk import top_k_global


def document_frequency(
    tokens_long: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "token",
    min_df: int = 0,
) -> DataFrame:
    """(token, df) — number of distinct documents containing the token (A2).
    ``min_df`` reproduces the reference's rare-term prune (P3: df > 1)."""
    out = tokens_long.groupBy(token_col).agg(
        F.countDistinct(id_col).alias("df")
    )
    if min_df:
        out = out.filter(F.col("df") > min_df)
    return out


def term_frequency(
    tokens_long: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "token",
    max_norm: bool = False,
) -> DataFrame:
    """(doc, token, tf) counts (A3). ``max_norm`` divides by the doc's max
    count (W4) via a window — no second aggregation pass."""
    tf = tokens_long.groupBy(id_col, token_col).agg(
        F.count(F.lit(1)).alias("tf")
    )
    if max_norm:
        w = Window.partitionBy(id_col)
        tf = tf.withColumn("tf", F.col("tf") / F.max("tf").over(w))
    return tf


def tfidf(
    tokens_long: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "token",
    n_docs: int | DataFrame | None = None,
    min_df: int = 0,
    max_norm: bool = False,
) -> DataFrame:
    """(doc, token, tf, df, tfidf) with tfidf = tf · log₂(N/df) (A4).

    The df side is vocabulary-sized → broadcast to avoid shuffling the
    big (doc, token) table a second time.

    ``n_docs`` may be a 1-row/1-column DataFrame (the corpus count as a
    plan, e.g. ``docs.agg(count(*))``): it is broadcast-cross-joined in
    as a scalar, keeping the whole computation one job instead of a
    separate driver-side ``count()`` action before the real query."""
    if n_docs is None:
        n_docs = tokens_long.select(id_col).distinct().count()
    tf = term_frequency(tokens_long, id_col, token_col, max_norm=max_norm)
    df_tbl = document_frequency(tokens_long, id_col, token_col, min_df=min_df)
    joined = tf.join(F.broadcast(df_tbl), token_col)
    if isinstance(n_docs, DataFrame):
        scalar = n_docs.toDF("_n_docs")
        return (
            joined.join(F.broadcast(scalar))
            .withColumn(
                "tfidf",
                F.col("tf")
                * F.log2(F.col("_n_docs").cast("double") / F.col("df")),
            )
            .drop("_n_docs")
        )
    return joined.withColumn(
        "tfidf", F.col("tf") * F.log2(F.lit(float(n_docs)) / F.col("df"))
    )


def top_k_vocabulary(tfidf_df: DataFrame, token_col: str = "token", k: int = 200) -> DataFrame:
    """Global top-K terms by max tfidf (A5 + W1), deterministic tie-break
    on the term itself (the reference's tie order was collection order —
    not reproducible; SURVEY §7 risk register)."""
    per_term = tfidf_df.groupBy(token_col).agg(F.max("tfidf").alias("max_tfidf"))
    return top_k_global(per_term, "max_tfidf", k, tiebreak=token_col)
