"""Similarity metrics (SURVEY.md §2.8 F8-F11) as Column expressions.

The reference computes cosine with sklearn on driver-collected vectors
(``/root/reference/utils/metrics.py:4``, used at
``models/content_based_model.py:512-516``), Pearson with a hand-rolled
formula (``utils/metrics.py:72-94``) and Jaccard over index sets
(``utils/metrics.py:48-53``). All of these are expressible as JVM-side
higher-order array functions — no UDF, no collect, fully codegen'd, and
they scale to any row count because they are per-row expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_arrays(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ over two equal-length array<double> columns (F8 numerator).

    ``zip_with`` + ``aggregate`` keeps the reduction sequential per row —
    deterministic order, JVM-side.
    """
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ (F11)."""
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_arrays(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array columns (F8); 0.0 when either norm
    is 0 (matches sklearn's convention the reference relies on)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        dot_arrays(a, b) / (na * nb)
    )


def jaccard_arrays(a: Column | str, b: Column | str) -> Column:
    """Jaccard similarity of two set-valued array columns (F10):
    |a∩b| / |a∪b|; 0.0 on empty union."""
    inter = F.size(F.array_intersect(_c(a), _c(b)))
    union = F.size(F.array_union(_c(a), _c(b)))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def pearson_safe(corr_col: Column) -> Column:
    """Wrap Spark's ``corr`` aggregate: zero-variance pairs yield NaN (or
    NULL, engine-version dependent) but the reference defines them as 0.0
    (``utils/metrics.py:92-93``)."""
    return F.coalesce(F.nanvl(corr_col, F.lit(0.0)), F.lit(0.0))
