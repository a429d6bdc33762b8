"""Trainable document-quality classifier: a fasttext/CCNet-style linear
model over signed hashed bag-of-words features (Joulin et al. 2016;
CCNet, Wenzek et al. 2020; the GPT-3 quality-filter recipe, Brown et
al. 2020 App. A) — the learned counterpart to the heuristic quality
scores (`q24_doc_quality`).

Split of responsibilities, chosen for the 100-TB shape:

- **Features are corpus-independent by construction**: length-normalized
  signed hashed term frequencies (`hashed_token_features`). No IDF —
  IDF is a corpus statistic, and a filter trained with train-corpus IDF
  then served against serve-corpus IDF scores a DIFFERENT function than
  it learned (train/serve skew). TF-only hashed features are identical
  on both sides by construction, which is exactly why the
  fasttext-style recipe uses them.
- **Training is bounded by the labeling budget, not the corpus**: the
  seed-labeled set (docs joined to a labels table) is 10⁴-10⁶ rows by
  construction, so densifying to `n_dims` doubles for Spark ML
  LogisticRegression is a bounded cost (4096 dims ≈ 32 KB/doc) paid
  once at fit time. Distributed L-BFGS handles labeled sets far beyond
  driver memory.
- **Serving never densifies and never leaves the JVM**: the model is a
  tiny (dim, coef) table broadcast into a long-form join —
  score = σ(Σ w_dim · coef_dim + b) via one hash aggregation per doc.
  No UDF, no Python, no vector type on the serve path; the hot path is
  whole-stage-codegen'd column algebra over exactly the long-form
  sparse representation the engine already standardizes on
  (SURVEY §2.8 F15).

No reference counterpart — jorgeviz/yelp_recommender has no document
filtering at all; this is part of the engine's LLM-data-pipeline family
(BASELINE "LLM-data-pipeline operators").
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yelp_recommender_spark.operators.vectorizer import (
    hashed_dim,
    hashed_sign,
)

__all__ = [
    "hashed_token_features",
    "train_quality_classifier",
    "score_quality",
    "score_quality_col",
    "save_model",
    "load_model",
]


def hashed_token_features(
    tokens_long: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "token",
    n_dims: int = 4096,
) -> DataFrame:
    """(id, dim, w) — length-normalized signed hashed bag of words:
    w(d) = Σ_{tok→d} sign(tok) · tf(tok) / len(doc).

    One shuffle to count terms per doc, a window sum for the doc length
    (same partitioning — no second exchange), one hash-agg onto the
    hashed dims. Corpus-independent: the same doc always produces the
    same features regardless of what other docs are present, which is
    the train/serve-skew guarantee the classifier relies on."""
    counts = tokens_long.groupBy(id_col, token_col).agg(
        F.count(F.lit(1)).alias("_tf")
    )
    w_doc = Window.partitionBy(id_col)
    return (
        counts.withColumn("_len", F.sum("_tf").over(w_doc))
        .select(
            id_col,
            hashed_dim(token_col, n_dims).alias("dim"),
            (
                hashed_sign(token_col)
                * F.col("_tf").cast("double")
                / F.col("_len")
            ).alias("_w"),
        )
        .groupBy(id_col, "dim")
        .agg(F.sum("_w").alias("w"))
    )


def train_quality_classifier(
    tokens_long: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "token",
    label_col: str = "label",
    n_dims: int = 4096,
    reg_param: float = 0.0,
    elastic_net: float = 0.0,
    max_iter: int = 100,
) -> tuple[np.ndarray, float]:
    """Fit logistic regression on the hashed features of the LABELED
    docs (inner join against ``labels``: label 1 = keep-quality,
    0 = reject) and return ``(weights[n_dims], intercept)`` — the
    entire model, a few KB, ready for :func:`score_quality`.

    ``standardization=False``: the features are already on a common
    scale (length-normalized counts), and an un-standardized fit keeps
    the learned coefficients directly interpretable against the raw
    features the serve path computes (standardized coefficients would
    bake train-set variances into the model — corpus state, the exact
    thing the feature design avoids)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from yelp_recommender_spark.operators.vectorizer import (
        assemble_embeddings,
    )

    lab = labels.select(
        id_col, F.col(label_col).cast("double").alias("_y")
    )
    # restrict to the LABELED docs before any featurization — the
    # semi join is what keeps training bounded by the labeling budget
    # (the aggregates below would otherwise shuffle the whole corpus,
    # since Catalyst cannot push a join under them)
    feats = hashed_token_features(
        tokens_long.join(lab.select(id_col), id_col, "left_semi"),
        id_col,
        token_col,
        n_dims,
    )
    dense = assemble_embeddings(
        feats,
        id_col=id_col,
        n_dims=n_dims,
        dim_col="dim",
        weight_col="w",
        out_col="_arr",
    ).join(lab, id_col)
    train = dense.select(
        array_to_vector("_arr").alias("features"),
        F.col("_y").alias("label"),
    )
    lr = LogisticRegression(
        maxIter=int(max_iter),
        regParam=float(reg_param),
        elasticNetParam=float(elastic_net),
        standardization=False,
    )
    model = lr.fit(train)
    return (
        np.asarray(model.coefficients.toArray(), dtype=np.float64),
        float(model.intercept),
    )


def score_quality_col(
    text,
    weights: np.ndarray,
    intercept: float,
    tokenized: bool = False,
) -> "F.Column":
    """σ(model · features(text)) as a single MAP-ONLY Column expression
    — the zero-shuffle serve path. The coefficient vector is embedded
    as a constant array literal and each token's contribution is
    ``sign(tok) · coef[dim(tok)] / len`` folded with `aggregate`; an
    empty, tokenless, or NULL text scores σ(intercept) (the empty-doc
    score by definition — a NULL must never propagate, since a NULL
    score silently passes every ``score < threshold`` drop-filter).
    Output rounded to 6. ``tokenized=True`` treats ``text`` as an
    already-tokenized ``array<string>`` column (skips the tokenizer —
    callers that carry a ``toks`` column avoid re-tokenizing).

    When to use which scorer: this column variant evaluates per row
    with NO exchange at all, so it works identically over a batch scan
    and under `readStream` (stateless — no watermark, no state store),
    and is the right shape for scoring at ingest. It carries the
    (n_dims)-element coefficient literal in the plan — fine at the
    default 4096, wrong past ~2¹⁴ (plan bloat); the long-form
    :func:`score_quality` (broadcast join + one hash-agg) is the path
    for very wide models. Both compute the same function; float
    summation order differs at the ulp level (token order vs
    dim-grouped order).
    """
    from yelp_recommender_spark.functions.text import tokens_col

    weights = np.asarray(weights, dtype=np.float64)
    n_dims = len(weights)
    if n_dims > 16384:
        raise ValueError(
            f"score_quality_col embeds the {n_dims}-dim coefficient "
            "vector as a plan literal — use score_quality (broadcast "
            "long-form) past 16384 dims"
        )
    coef_arr = F.array(*[F.lit(float(w)) for w in weights])
    c = F.col(text) if isinstance(text, str) else text
    if tokenized:
        toks = F.coalesce(c, F.array().cast("array<string>"))
    else:
        toks = tokens_col(F.coalesce(c, F.lit("")))
    z = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + hashed_sign(t).cast("double")
        * F.element_at(coef_arr, hashed_dim(t, n_dims) + 1),
    ) / F.size(toks) + F.lit(float(intercept))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    empty = F.lit(
        round(float(1.0 / (1.0 + np.exp(-float(intercept)))), 6)
    )
    return F.when(F.size(toks) == 0, empty).otherwise(F.round(score, 6))


def save_model(path: str, weights: np.ndarray, intercept: float) -> None:
    """Persist the model as one JSON file (weights + intercept + the
    feature-space version stamp). A quality model is a few KB-MB —
    a single driver-side file, same class as the ANN meta.json; the
    atomic tmp-then-rename write means a crash never leaves a torn
    model for a later `curate --quality-model` to half-read."""
    import json
    import os

    payload = json.dumps(
        {
            "format": "qualityclf-v1",
            "n_dims": int(len(weights)),
            "intercept": float(intercept),
            "weights": [float(w) for w in np.asarray(weights)],
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


def load_model(path: str) -> tuple[np.ndarray, float]:
    """Load a :func:`save_model` file -> (weights, intercept); rejects
    unknown formats and length-inconsistent payloads rather than
    scoring with a silently-wrong feature space."""
    import json

    with open(path) as f:
        m = json.load(f)
    if m.get("format") != "qualityclf-v1":
        raise ValueError(
            f"{path}: not a qualityclf-v1 model (format="
            f"{m.get('format')!r})"
        )
    w = np.asarray(m["weights"], dtype=np.float64)
    if len(w) != int(m["n_dims"]):
        raise ValueError(
            f"{path}: weights length {len(w)} != n_dims {m['n_dims']}"
        )
    return w, float(m["intercept"])


def score_quality(
    tokens_long: DataFrame,
    weights: np.ndarray,
    intercept: float,
    id_col: str = "doc_id",
    token_col: str = "token",
    n_dims: int | None = None,
) -> DataFrame:
    """(id, quality_score) — σ(Σ w·coef + b) for every doc in
    ``tokens_long``, rounded to 6. The corpus-scale path: the model is
    a broadcast (dim, coef) table (zero coefficients pruned — L1
    training shrinks the broadcast), joined into the long-form features
    and folded with one hash aggregation per doc. Entirely JVM-side.

    Docs with no tokens never appear in ``tokens_long`` and so have no
    output row; a caller scoring a doc universe left-joins and fills
    ``σ(intercept)`` (the empty-doc score by definition)."""
    weights = np.asarray(weights, dtype=np.float64)
    if n_dims is None:
        n_dims = len(weights)
    if len(weights) != n_dims:
        raise ValueError(
            f"weights has {len(weights)} dims, expected n_dims={n_dims}"
        )
    spark = tokens_long.sparkSession
    nz = [(int(i), float(c)) for i, c in enumerate(weights) if c != 0.0]
    if nz:
        coef = spark.createDataFrame(nz, "dim int, coef double")
    else:
        coef = spark.createDataFrame([], "dim int, coef double")
    feats = hashed_token_features(tokens_long, id_col, token_col, n_dims)
    z = (
        feats.join(F.broadcast(coef), "dim", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.coalesce(F.col("coef"), F.lit(0.0)) * F.col("w")
            ).alias("_z")
        )
    )
    logit = F.col("_z") + F.lit(float(intercept))
    return z.select(
        id_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias(
            "quality_score"
        ),
    )
