"""Text scalar functions (SURVEY.md §2.8 F1-F4) as Column expressions.

The reference tokenizes inside RDD lambdas: lowercase + regex punctuation
padding + whitespace split + stopword/punct filter
(``/root/reference/models/content_based_model.py:19-22,65-83``). Here the
same pipeline is pure Column algebra — JVM-side, codegen'd, no Python.

The canonical tokenizer (``tokens_col``) is deliberately simple and
SQL-portable (lower → strip non-alphanumerics → split on spaces → drop
empties) so an external oracle can reproduce it exactly; the Yelp-style
variant (``tokenize``) adds the reference's punctuation padding + stopword
removal semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Same character class the reference pads with spaces
# (/root/reference/models/content_based_model.py:22).
PUNCT_CLASS = r"([.,!?:;()\[\]\"'\-#*/$&%])"


def pad_punctuation(col: Column | str) -> Column:
    """Surround punctuation with spaces so a whitespace split isolates it
    (F2: ``regexp_replace(text, r, ' $1 ')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, PUNCT_CLASS, r" $1 ")


def tokens_col(col: Column | str) -> Column:
    """Canonical tokenizer: lower → non-alphanumerics to spaces → split →
    drop empty tokens. Returns array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " ")
    return F.filter(F.split(cleaned, " "), lambda t: t != "")


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Yelp-style tokenize (F1-F3 + P2): pad punctuation, lowercase, split,
    drop empties / bare punctuation / stopwords.

    Stopword removal uses ``array_except`` against a literal array —
    evaluated as a broadcast constant, no join, no UDF.
    """
    toks = F.filter(
        F.split(F.lower(pad_punctuation(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    # remove bare punctuation tokens produced by the padding
    toks = F.filter(toks, lambda t: ~t.rlike(r"^[.,!?:;()\[\]\"'\-#*/$&%]+$"))
    if stopwords:
        toks = F.array_except(toks, F.array(*[F.lit(w) for w in stopwords]))
    return df.withColumn(out_col, toks)


def explode_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
) -> DataFrame:
    """(id, token) long form via the canonical tokenizer — the input shape
    for DF/TF/TF-IDF aggregations. `explode` is Spark's UDTF-shaped
    primitive (SURVEY.md §2.10)."""
    return df.select(id_col, F.explode(tokens_col(text_col)).alias(token_col))
