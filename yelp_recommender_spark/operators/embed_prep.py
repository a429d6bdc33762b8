"""Embedding preprocessing — the steps between raw model outputs and the
ANN/near-dup surface: L2 normalization (cosine becomes dot product;
required before SRP/IVF/PQ indexing for the metric to mean what callers
think) and PCA projection/whitening (dimensionality reduction before
quantization — the standard recipe ahead of IVF-PQ at scale).

Both stay JVM-side where possible: normalization is pure higher-order
column expressions (no Python), PCA uses Spark ML's distributed
covariance + eigendecomposition (one pass over the data for the Gramian;
the k×d eigenbasis lives on the driver, applied as a broadcast matmul).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vector_norm(vec_col: str | Column) -> Column:
    """L2 norm of an array column, computed in double: cast each element,
    square, left-fold sum, sqrt — the same element order and operation
    sequence any engine reproduces bit-for-bit."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sq = F.aggregate(
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out: str = "unit_vec"
) -> DataFrame:
    """``df`` plus ``out`` = the unit-norm vector (array<double>).
    All-zero vectors pass through as zeros (dividing by their 0-norm
    would poison downstream aggregates with NaN; zero vectors carry no
    direction and should be filtered by the caller's quality gate)."""
    # two-step projection: the norm fold lands in a temp attribute and
    # the divide lambda references that attribute — inlining the fold
    # into the transform lambda (the previous shape) re-evaluated the
    # O(dim) aggregate for EVERY element, an O(dim²)-per-row
    # interpreted-HOF cost. The temp survives CollapseProject (two
    # consumers of a non-cheap expression); same fold expression → the
    # unit vectors are bit-identical.
    tmp = "_l2n_norm"
    norm = F.col(tmp)
    unit = F.when(
        norm == 0.0, F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).otherwise(F.transform(F.col(vec_col), lambda x: x.cast("double") / norm))
    return df.withColumn(tmp, vector_norm(vec_col)).withColumn(out, unit).drop(tmp)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    id_col: str = "vec_id",
    whiten: bool = False,
) -> tuple[DataFrame, list[float]]:
    """Project vectors onto their top-``k`` principal components.
    Returns (projected DataFrame with ``pca_vec`` array<double>, the
    explained-variance fractions per component).

    ``whiten=True`` divides each component by sqrt(its variance) so the
    output has identity covariance — what PQ codebook training wants
    (equal quantization budget per direction).

    Sign caveat: eigenvector sign is arbitrary, so projected VALUES are
    implementation-specific even though the subspace, pairwise distances,
    and explained variances are not — which is why the gates are
    invariant-based (pytest), not a value oracle.

    Scale: ``pyspark.ml.feature.PCA`` computes the d×d Gramian in one
    distributed pass (fine for embedding dims up to a few thousand); the
    k×d basis is driver-held and applied as a broadcast matmul per row.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    prepared = df.withColumn(
        "_mlvec",
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ),
    )
    model = PCA(k=k, inputCol="_mlvec", outputCol="_pca").fit(prepared)
    projected = model.transform(prepared)
    out = projected.withColumn("_arr", vector_to_array("_pca"))
    if whiten:
        ev = model.explainedVariance.toArray()
        total = [float(x) for x in ev]
        # variance per component in original units = fraction × total
        # variance; MLlib exposes fractions, so recover absolute scale
        # from the projected data itself (exact, one aggregate)
        stats = out.select(
            *[
                F.variance(F.element_at("_arr", i + 1)).alias(f"v{i}")
                for i in range(k)
            ]
        ).head()
        # fail loudly on degenerate components (k ≥ intrinsic rank,
        # constant direction, or n=1 → sample variance 0/None): a 0
        # scale would silently emit NaN/Inf whitened vectors (ADVICE r4)
        degenerate = [
            i
            for i in range(k)
            if stats[f"v{i}"] is None or float(stats[f"v{i}"]) < 1e-12
        ]
        if degenerate:
            raise ValueError(
                f"pca_project(whiten=True): components {degenerate} have "
                "(near-)zero variance — the input's intrinsic rank is "
                f"below k={k}; lower k or skip whitening"
            )
        scales = [float(stats[f"v{i}"]) ** 0.5 for i in range(k)]
        whitened = F.array(
            *[
                F.element_at("_arr", i + 1) / F.lit(scales[i])
                for i in range(k)
            ]
        )
        out = out.withColumn("_arr", whitened)
    result = out.select(
        id_col, F.col("_arr").alias("pca_vec")
    )
    return result, [float(x) for x in model.explainedVariance.toArray()]
