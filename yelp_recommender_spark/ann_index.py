"""Persisted ANN index lifecycle — build once / serve many, as a library
and CLI surface (``cli.py ann-build`` / ``ann-query``).

An index directory is self-describing:

    <dir>/meta.json       tier + build params (validated at query time)
    <dir>/assignments/    IVF: (id, vec, centroid_id) parquet
    <dir>/codes/          IVF-PQ: (id, codes, centroid_id) parquet
    <dir>/centers/        routing matrix (centroid_id, center)
    <dir>/codebooks/      IVF-PQ: (subspace, code, center)

Scale: building is the train-once cost (distributed KMeans + map-only
encode); querying refits nothing — the routing table and codebooks are a
few hundred KB of driver state regardless of corpus size, and scoring is
the map-only Arrow pass over the persisted table
(:func:`~yelp_recommender_spark.operators.ann.ivf_topk_indexed`,
:func:`~yelp_recommender_spark.operators.pq.ivfpq_topk_indexed`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

TIERS = ("ivf", "ivfpq")


def build_ann_index(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    tier: str = "auto",
    n_centroids: int = 64,
    m: int = 8,
    ksub: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    ivf_limit: int | None = None,
    encoding: str = "raw",
) -> dict:
    """Train + persist an ANN index over a parquet table of embeddings;
    returns the build report (row counts + artifact paths).

    ``encoding`` ('raw' default | 'residual' | 'opq' | 'opq_residual')
    selects the IVF-PQ code semantics
    (:func:`~yelp_recommender_spark.operators.pq.ivfpq_topk`: residual
    quantizes centroid offsets — tighter ADC estimates on clustered
    corpora for the same (m, ksub) budget; opq learns an orthogonal
    rotation balancing subspace energy — the gain on
    correlated/anisotropic embeddings, with the rotation persisted as
    a fourth artifact). Recorded in meta.json so the query path always
    scores the codes as what they are. On the IVF tier it does not
    apply (float vectors serve exact scores, strictly better than any
    PQ) and is not recorded.

    ``tier="auto"`` (default) resolves the persisted rung by corpus
    cardinality with the SAME threshold as the serving planner
    (:func:`~yelp_recommender_spark.operators.ann.topk_auto`): IVF while
    a probe's worth of float vectors is cheap to stream
    (≤ ``ivf_limit``, default
    :data:`~yelp_recommender_spark.operators.ann.DEFAULT_IVF_TOPK_LIMIT`),
    IVF-PQ beyond — so a caller who never thinks about tiers still
    cannot build a float-vector assignment table for a corpus that
    needs codes. The resolved tier is recorded in meta.json."""
    from yelp_recommender_spark.operators.ann import (
        DEFAULT_IVF_TOPK_LIMIT,
        centers_to_df,
        estimated_row_count,
        ivf_fit_assign,
    )

    if tier not in TIERS + ("auto",):
        raise ValueError(
            f"tier must be one of {TIERS + ('auto',)}, got {tier!r}"
        )
    if encoding not in ("raw", "residual", "opq", "opq_residual"):
        raise ValueError(
            f"encoding must be 'raw', 'residual', 'opq', or "
            f"'opq_residual', got {encoding!r}"
        )
    df = spark.read.parquet(input_path)
    if tier == "auto":
        limit = DEFAULT_IVF_TOPK_LIMIT if ivf_limit is None else ivf_limit
        n = estimated_row_count(df)
        if n is None or n <= limit:
            # exact confirmation before persisting the float-vector
            # tier: a stale-LOW estimate must not build an
            # 8·dim-bytes/row assignment table for a corpus that needs
            # codes — the estimate is trusted only in the safe
            # (big → ivfpq) direction, same rule as the serving
            # planners (operators/ann.py topk_auto)
            n = df.count()
        tier = "ivf" if n <= limit else "ivfpq"
    assigned, centers = ivf_fit_assign(
        df, id_col, vec_col, n_centroids=n_centroids, seed=seed
    )
    os.makedirs(index_dir, exist_ok=True)
    n_rows: int
    if tier == "ivf":
        assigned.write.mode("overwrite").parquet(
            os.path.join(index_dir, "assignments")
        )
        n_rows = spark.read.parquet(
            os.path.join(index_dir, "assignments")
        ).count()
    else:
        from yelp_recommender_spark.cache import clear_caches, register_persist, registry_mark
        from yelp_recommender_spark.operators.pq import (
            codebooks_to_df,
            rotation_to_df,
            train_and_encode,
            train_and_encode_opq,
            train_and_encode_opq_residual,
        )

        mark = registry_mark()
        assigned = register_persist(assigned)  # codebook sample + encode
        if encoding in ("opq", "opq_residual"):
            if encoding == "opq":
                books, coded, rotation = train_and_encode_opq(
                    assigned, id_col=id_col, m=m, ksub=ksub, seed=seed,
                )
            else:
                books, coded, rotation = train_and_encode_opq_residual(
                    assigned, centers, id_col=id_col, m=m, ksub=ksub,
                    seed=seed,
                )
            rotation_to_df(spark, rotation).write.mode(
                "overwrite"
            ).parquet(os.path.join(index_dir, "rotation"))
        else:
            books, coded = train_and_encode(
                assigned, centers, id_col=id_col, m=m, ksub=ksub,
                seed=seed, encoding=encoding,
            )
        coded.write.mode("overwrite").parquet(os.path.join(index_dir, "codes"))
        codebooks_to_df(spark, books).write.mode("overwrite").parquet(
            os.path.join(index_dir, "codebooks")
        )
        n_rows = spark.read.parquet(os.path.join(index_dir, "codes")).count()
        clear_caches(since=mark)
    centers_to_df(spark, centers).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centers")
    )
    meta = {
        "tier": tier,
        "n_centroids": n_centroids,
        "m": m,
        "ksub": ksub,
        "id_col": id_col,
        "vec_col": vec_col,
        "seed": seed,
    }
    if tier == "ivfpq":
        meta["encoding"] = encoding
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return {"tier": tier, "n_indexed": int(n_rows), "index_dir": index_dir}


def query_ann_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame | str,
    k: int = 10,
    n_probe: int = 8,
) -> DataFrame:
    """Top-k neighbors for a query table (DataFrame or parquet path)
    against a persisted index — dispatches on the index's meta.json."""
    from yelp_recommender_spark.operators.ann import (
        centers_from_df,
        ivf_topk_indexed,
    )

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if isinstance(queries, str):
        queries = spark.read.parquet(queries)
    centers = centers_from_df(
        spark.read.parquet(os.path.join(index_dir, "centers"))
    )
    if meta["tier"] == "ivf":
        return ivf_topk_indexed(
            queries,
            spark.read.parquet(os.path.join(index_dir, "assignments")),
            centers,
            k=k,
            n_probe=n_probe,
            id_col=meta["id_col"],
            vec_col=meta["vec_col"],
        )
    from yelp_recommender_spark.operators.pq import (
        codebooks_from_df,
        ivfpq_topk_indexed,
        rotation_from_df,
    )

    # pre-r8 indexes carry no encoding field — they are raw codes
    encoding = meta.get("encoding", "raw")
    rotation = None
    if encoding in ("opq", "opq_residual"):
        rotation = rotation_from_df(
            spark.read.parquet(os.path.join(index_dir, "rotation"))
        )
    return ivfpq_topk_indexed(
        queries,
        spark.read.parquet(os.path.join(index_dir, "codes")),
        centers,
        codebooks_from_df(
            spark.read.parquet(os.path.join(index_dir, "codebooks"))
        ),
        k=k,
        n_probe=n_probe,
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
        encoding=encoding,
        rotation=rotation,
    )
