"""ALS matrix factorization + hybrid blend (SURVEY.md §2.9 M5-M9, §3.4;
``/root/reference/scripts/als_recommender.py`` / ``train_als.py`` /
``train_hybrid.py`` / ``predict_hybrid.py``).

Differences from the reference, by design:

- ID encoding: the reference dictionary-encodes string ids with
  ``zipWithIndex().collectAsMap()`` + driver-side extension for unseen
  test ids (``als_recommender.py:58-67,110-115``) — unbounded driver
  state. Here :func:`train_als_indexed`/:func:`predict_als_indexed` use
  :class:`~pyspark.ml.feature.StringIndexer` with
  ``handleInvalid='keep'`` for both; :func:`train_als` is the fast path
  for already-numeric ids (int cast, no indexer).
- Cold start: ``coldStartStrategy='nan'`` + the engine's coalesce ladder
  (ū → b̄ → 2.5) instead of a flat ``fillna(2.5)``
  (``als_recommender.py:130``) — strictly more informative, tagged for
  the per-rule RMSE breakdown.
- The hybrid's blend regressor: the reference trains a *driver-side*
  sklearn MLP on ``toPandas()`` output (``train_hybrid.py:101-110,128``,
  M8) — Spark ML has no MLP regressor, so the engine substitutes
  :class:`~pyspark.ml.regression.GBTRegressor` on the same
  [ALS, UAVG, BAVG] feature contract (``train_hybrid.py:128-134``),
  which trains distributed. The sklearn-in-pandas-UDF alternative is a
  drop-in if exact MLP parity is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.rules import DEFAULT_STARS

_ALS_FEATURES = ["als_score", "user_avg", "biz_avg"]


def train_als(
    train: DataFrame,
    rank: int = 10,
    reg: float = 0.2,
    max_iter: int = 10,
    seed: int = 42,
):
    """Fit ALS on (user_id, business_id, stars) with integer-castable ids.

    Returns the fitted ALSModel (``userFactors``/``itemFactors`` are
    DataFrames — identical persistence story to the reference's M5)."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        regParam=reg,
        maxIter=max_iter,
        seed=seed,
        userCol="user_id",
        itemCol="business_id",
        ratingCol="stars",
        coldStartStrategy="nan",
    )
    return als.fit(
        train.select(
            F.col("user_id").cast("int").alias("user_id"),
            F.col("business_id").cast("int").alias("business_id"),
            "stars",
        )
    )


def val_split(
    ratings: DataFrame,
    holdout_mod: int = 10,
    user_col: str = "user_id",
    item_col: str = "business_id",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic validation split for model selection: a stable hash
    gate on (user_id, business_id) holds out ~1/``holdout_mod`` of the
    ratings. Partition-stable and reproducible — the engine's substitute
    for the reference's seedless ``randomSplit([0.9, 0.1])``
    (``/root/reference/scripts/train_als.py:94``), which yields a
    different split every run."""
    gate = (
        F.pmod(
            F.xxhash64(
                F.col(user_col).cast("string"),
                F.col(item_col).cast("string"),
            ),
            F.lit(holdout_mod),
        )
        == 0
    )
    return ratings.filter(~gate), ratings.filter(gate)


def train_als_grid(
    ratings: DataFrame,
    ranks: tuple[int, ...] = (40, 50),
    regs: tuple[float, ...] = (0.2, 0.4),
    max_iter: int = 18,
    seed: int = 42,
    holdout_mod: int = 10,
) -> dict:
    """Hyperparameter grid search + model selection, mirroring the
    reference's ranks × regs sweep (``train_als.py:89-106``: ranks
    {40,50} × regs {0.2,0.4}, maxIter 18, 90/10 split, RMSE pick).

    Differences by design: the split is the deterministic hash gate
    (:func:`val_split`) instead of seedless randomSplit, and validation
    RMSE excludes cold val pairs (NaN under ``coldStartStrategy='nan'``)
    with the exclusion COUNT recorded per config — the reference's
    evaluator silently returns NaN for the whole config in that case.

    Returns {"model": best ALSModel, "rank", "reg", "val_rmse",
    "selection": [{rank, reg, val_rmse, n_scored, n_missing}, ...]}.
    Ties break on grid order (ranks-major), deterministically.

    Scale: models train sequentially (each ALS fit is itself a
    distributed iterative job — running grid points concurrently on one
    cluster just time-slices the same executors); train/val are persisted
    across the sweep so the upstream plan runs once."""
    from yelp_recommender_spark.models.evaluator import rmse

    tr, val = val_split(ratings, holdout_mod)
    tr, val = tr.persist(), val.persist()
    try:
        best, selection = None, []
        for rank in ranks:
            for reg in regs:
                model = train_als(
                    tr, rank=rank, reg=reg, max_iter=max_iter, seed=seed
                )
                preds = model.transform(
                    val.select(
                        F.col("user_id").cast("int").alias("user_id"),
                        F.col("business_id").cast("int").alias("business_id"),
                    )
                ).withColumnRenamed("prediction", "stars")
                m = rmse(preds, val).head()
                row = {
                    "rank": rank,
                    "reg": reg,
                    "val_rmse": m.rmse,
                    "n_scored": m.n_scored,
                    "n_missing": m.n_missing,
                }
                selection.append(row)
                if (
                    m.rmse is not None
                    and (best is None or m.rmse < best["val_rmse"])
                ):
                    best = {**row, "model": model}
        if best is None:  # every config scored zero val pairs
            raise ValueError(
                "ALS grid search: no config produced a validation RMSE "
                "(all val pairs cold?) — check the split or the data"
            )
        return {**best, "selection": selection}
    finally:
        tr.unpersist()
        val.unpersist()


def train_als_grid_indexed(
    train: DataFrame,
    ranks: tuple[int, ...] = (40, 50),
    regs: tuple[float, ...] = (0.2, 0.4),
    max_iter: int = 18,
    seed: int = 42,
    holdout_mod: int = 10,
    user_col: str = "user_id",
    item_col: str = "business_id",
) -> dict:
    """Grid search over arbitrary (string or numeric) ids — the CLI's
    path (``params.grid``). Indexers fit once on the FULL ratings table
    (id encoding is not rating leakage; the reference extends its id maps
    over validation ids too, ``train_als.py:72-83``), the split gates on
    the ORIGINAL ids so it is stable however the indexers change, and the
    encoded train/val are persisted across the sweep.

    Returns the persistable bundle {user_indexer, item_indexer, als}
    plus {"rank", "reg", "val_rmse", "selection"} describing the pick."""
    from pyspark.ml.recommendation import ALS

    from yelp_recommender_spark.models.evaluator import rmse

    ui, bi = fit_id_indexers(train, user_col, item_col)
    tr_raw, val_raw = val_split(train, holdout_mod, user_col, item_col)
    enc_tr = (
        _encode_ids(tr_raw, ui, bi, user_col, item_col)
        .select("_u_idx", "_b_idx", "stars")
        .persist()
    )
    enc_val = (
        _encode_ids(val_raw, ui, bi, user_col, item_col)
        .select("_u_idx", "_b_idx", "stars")
        .persist()
    )
    as_keys = [
        F.col("_u_idx").alias("user_id"),
        F.col("_b_idx").alias("business_id"),
    ]
    try:
        best, selection = None, []
        for rank in ranks:
            for reg in regs:
                als = ALS(
                    rank=rank,
                    regParam=reg,
                    maxIter=max_iter,
                    seed=seed,
                    userCol="_u_idx",
                    itemCol="_b_idx",
                    ratingCol="stars",
                    coldStartStrategy="nan",
                ).fit(enc_tr)
                preds = als.transform(enc_val).select(
                    *as_keys, F.col("prediction").alias("stars")
                )
                m = rmse(preds, enc_val.select(*as_keys, "stars")).head()
                row = {
                    "rank": rank,
                    "reg": reg,
                    "val_rmse": m.rmse,
                    "n_scored": m.n_scored,
                    "n_missing": m.n_missing,
                }
                selection.append(row)
                if (
                    m.rmse is not None
                    and (best is None or m.rmse < best["val_rmse"])
                ):
                    best = {**row, "als": als}
        if best is None:
            raise ValueError(
                "ALS grid search: no config produced a validation RMSE "
                "(all val pairs cold?) — check the split or the data"
            )
        return {
            "user_indexer": ui,
            "item_indexer": bi,
            **best,
            "selection": selection,
        }
    finally:
        enc_tr.unpersist()
        enc_val.unpersist()


def fit_id_indexers(
    train: DataFrame, user_col: str = "user_id", item_col: str = "business_id"
):
    """Dictionary-encode string ids for ALS (W3) — the reference does this
    driver-side with ``zipWithIndex().collectAsMap()`` plus a manual
    extension for unseen test ids
    (``/root/reference/scripts/als_recommender.py:58-67,110-115``). Here
    :class:`~pyspark.ml.feature.StringIndexer` with
    ``handleInvalid='keep'`` covers both: training ids get dense indices,
    and any id first seen at predict time maps to the reserved extra
    bucket, which has no trained factor → NaN prediction → the cold-start
    ladder. (The reference gives each unseen id its *own* new index; all
    of them predict NaN either way, so collapsing them into one bucket is
    behavior-identical — documented divergence.)

    Returns (user_indexer_model, item_indexer_model), both MLWritable for
    :mod:`~yelp_recommender_spark.models.persistence`."""
    from pyspark.ml.feature import StringIndexer

    src = train.select(
        F.col(user_col).cast("string").alias("_u_str"),
        F.col(item_col).cast("string").alias("_b_str"),
    )
    ui = StringIndexer(
        inputCol="_u_str", outputCol="_u_idx", handleInvalid="keep"
    ).fit(src)
    bi = StringIndexer(
        inputCol="_b_str", outputCol="_b_idx", handleInvalid="keep"
    ).fit(src)
    return ui, bi


def _encode_ids(
    df: DataFrame,
    ui,
    bi,
    user_col: str = "user_id",
    item_col: str = "business_id",
) -> DataFrame:
    enc = df.withColumn("_u_str", F.col(user_col).cast("string")).withColumn(
        "_b_str", F.col(item_col).cast("string")
    )
    enc = bi.transform(ui.transform(enc))
    return (
        enc.withColumn("_u_idx", F.col("_u_idx").cast("int"))
        .withColumn("_b_idx", F.col("_b_idx").cast("int"))
        .drop("_u_str", "_b_str")
    )


def train_als_indexed(
    train: DataFrame,
    rank: int = 10,
    reg: float = 0.2,
    max_iter: int = 10,
    seed: int = 42,
    user_col: str = "user_id",
    item_col: str = "business_id",
) -> dict:
    """ALS over arbitrary (string or numeric) ids: fit the id indexers on
    train, fit ALS on the encoded indices. Returns a persistable bundle
    {user_indexer, item_indexer, als} (all MLWritable)."""
    from pyspark.ml.recommendation import ALS

    ui, bi = fit_id_indexers(train, user_col, item_col)
    enc = _encode_ids(train, ui, bi, user_col, item_col)
    als = ALS(
        rank=rank,
        regParam=reg,
        maxIter=max_iter,
        seed=seed,
        userCol="_u_idx",
        itemCol="_b_idx",
        ratingCol="stars",
        coldStartStrategy="nan",
    ).fit(enc.select("_u_idx", "_b_idx", "stars"))
    return {"user_indexer": ui, "item_indexer": bi, "als": als}


def predict_als_indexed(
    bundle: dict,
    test: DataFrame,
    user_avg: DataFrame,
    biz_avg: DataFrame,
    default: float = DEFAULT_STARS,
    user_col: str = "user_id",
    item_col: str = "business_id",
) -> DataFrame:
    """ALS transform through the id indexers + cold-start ladder; output
    keeps the ORIGINAL id columns (the averages join on them), matching
    :func:`predict_als`'s (user_id, business_id, stars, decision)."""
    enc = _encode_ids(
        test.select(user_col, item_col),
        bundle["user_indexer"],
        bundle["item_indexer"],
        user_col,
        item_col,
    )
    scored = bundle["als"].transform(enc)
    als_score = F.when(~F.isnan("prediction"), F.col("prediction"))
    j = (
        scored.join(F.broadcast(user_avg), user_col, "left")
        .join(F.broadcast(biz_avg), item_col, "left")
        .withColumn("_als", als_score)
    )
    decision = (
        F.when(F.col("_als").isNotNull(), "als")
        .when(F.col("user_avg").isNotNull(), "usr_avg")
        .when(F.col("biz_avg").isNotNull(), "biz_avg")
        .otherwise("default")
    )
    return j.select(
        user_col,
        item_col,
        F.coalesce("_als", "user_avg", "biz_avg", F.lit(default)).alias("stars"),
        decision.alias("decision"),
    )


def predict_als(
    model,
    test: DataFrame,
    user_avg: DataFrame,
    biz_avg: DataFrame,
    default: float = DEFAULT_STARS,
) -> DataFrame:
    """ALS transform + cold-start ladder. Output: (user_id, business_id,
    stars, decision)."""
    scored = model.transform(
        test.select(
            F.col("user_id").cast("int").alias("user_id"),
            F.col("business_id").cast("int").alias("business_id"),
        )
    )
    als_score = F.when(~F.isnan("prediction"), F.col("prediction"))
    j = (
        scored.join(F.broadcast(user_avg), "user_id", "left")
        .join(F.broadcast(biz_avg), "business_id", "left")
        .withColumn("_als", als_score)
    )
    decision = (
        F.when(F.col("_als").isNotNull(), "als")
        .when(F.col("user_avg").isNotNull(), "usr_avg")
        .when(F.col("biz_avg").isNotNull(), "biz_avg")
        .otherwise("default")
    )
    return j.select(
        "user_id",
        "business_id",
        F.coalesce("_als", "user_avg", "biz_avg", F.lit(default)).alias("stars"),
        decision.alias("decision"),
    )


def hybrid_features(
    als_model,
    pairs: DataFrame,
    user_avg: DataFrame,
    biz_avg: DataFrame,
    global_mean: float,
) -> DataFrame:
    """[ALS, UAVG, BAVG] design matrix (``train_hybrid.py:128-134``):
    missing averages fall back to the global mean
    (``train_hybrid.py:117-119``), missing ALS to the row's average
    signal."""
    scored = als_model.transform(
        pairs.select(
            F.col("user_id").cast("int").alias("user_id"),
            F.col("business_id").cast("int").alias("business_id"),
        )
    )
    g = F.lit(global_mean)
    ua = F.coalesce("user_avg", g)
    ba = F.coalesce("biz_avg", g)
    als_score = F.coalesce(
        F.when(~F.isnan("prediction"), F.col("prediction")), (ua + ba) / 2
    )
    return (
        scored.join(F.broadcast(user_avg), "user_id", "left")
        .join(F.broadcast(biz_avg), "business_id", "left")
        .select(
            "user_id",
            "business_id",
            als_score.alias("als_score"),
            ua.alias("user_avg"),
            ba.alias("biz_avg"),
        )
    )


def hybrid_features_indexed(
    bundle: dict,
    pairs: DataFrame,
    user_avg: DataFrame,
    biz_avg: DataFrame,
    global_mean: float,
    user_col: str = "user_id",
    item_col: str = "business_id",
) -> DataFrame:
    """[ALS, UAVG, BAVG] design matrix for arbitrary (string or numeric)
    ids: ALS scores flow through the bundle's indexers while the average
    joins stay on the ORIGINAL id columns (``hybrid_features`` int-casts
    ids, which only works when ALS indices and avg keys coincide)."""
    enc = _encode_ids(pairs, bundle["user_indexer"], bundle["item_indexer"],
                      user_col, item_col)
    scored = bundle["als"].transform(enc)
    g = F.lit(global_mean)
    ua = F.coalesce("user_avg", g)
    ba = F.coalesce("biz_avg", g)
    als_score = F.coalesce(
        F.when(~F.isnan("prediction"), F.col("prediction")), (ua + ba) / 2
    )
    return (
        scored.join(F.broadcast(user_avg), user_col, "left")
        .join(F.broadcast(biz_avg), item_col, "left")
        .select(
            user_col,
            item_col,
            als_score.alias("als_score"),
            ua.alias("user_avg"),
            ba.alias("biz_avg"),
        )
    )


def train_hybrid_regressor(features_with_label: DataFrame, seed: int = 42):
    """Fit the blend regressor on (als_score, user_avg, biz_avg) → stars.

    The input is re-spread and pinned for the fit: boosting re-scans the
    training set once per tree, and the feature table arrives here as the
    output of an AQE-coalesced join (3 partitions on local[32] — every
    boosting iteration then runs 3-task stages). Repartitioning to
    the session's parallelism and persisting for the fit's duration cut
    the measured fit wall-clock ~30%. (Histogram aggregation order can
    shift split stats at float precision, so trees are equivalent, not
    bit-pinned — the hybrid entries are rows-only and quality-gated, not
    hash-gated, for exactly this class of reason.)

    Capacity: 10 depth-3 trees at stepSize 0.2 — 80 leaves over a
    3-feature blend is ample for the reference MLP's role (a small
    function approximator over [als, user_avg, biz_avg]); measured at
    sf0.1, doubling to 20 trees at stepSize 0.1 left test RMSE flat
    (1.5557 vs 1.5549) while doubling the fit's sequential-boosting
    wall-clock, which dominates q57."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.pipeline import Pipeline
    from pyspark.ml.regression import GBTRegressor

    spark = features_with_label.sparkSession
    # Size the fit partitioning from the data, not the core count:
    # boosting pays the per-stage scheduling cost once per tree LEVEL per
    # iteration, so small per-task row counts make scheduling dominate.
    # ~64k rows per task amortizes it (interleaved A/B at sf0.1, 540k
    # rows: 8 partitions beat defaultParallelism=32 in four consecutive
    # paired passes, 9.6→7.6 / 8.5→5.8 / 6.6→4.2 / 5.3→3.7 s); the cap
    # keeps a huge corpus from under-parallelizing — beyond
    # 4×parallelism·64k rows every core already has deep queues. The
    # exact count comes off the staged cache the fit reuses, so sizing
    # costs one cached-column pass, not an extra lineage run.
    staged = features_with_label.persist()
    n_rows = staged.count()
    n_fit = int(
        max(
            1,
            min(
                n_rows // 64_000 + 1,
                4 * spark.sparkContext.defaultParallelism,
            ),
        )
    )
    fit_input = staged.repartition(n_fit).persist()
    assembler = VectorAssembler(inputCols=_ALS_FEATURES, outputCol="features")
    gbt = GBTRegressor(
        labelCol="stars",
        featuresCol="features",
        maxIter=10,
        maxDepth=3,
        stepSize=0.2,
        seed=seed,
    )
    try:
        return Pipeline(stages=[assembler, gbt]).fit(fit_input)
    finally:
        fit_input.unpersist()
        staged.unpersist()


def predict_hybrid(regressor, features: DataFrame) -> DataFrame:
    """Score the blend. Output: (user_id, business_id, stars, decision)."""
    return regressor.transform(features).select(
        "user_id",
        "business_id",
        F.col("prediction").alias("stars"),
        F.lit("hybrid").alias("decision"),
    )
