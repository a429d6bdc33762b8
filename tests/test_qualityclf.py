"""Gates for `operators/qualityclf.py` — trainable hashed-feature
quality classifier.

Pins: held-out separation on a planted good/bad corpus, exact parity of
the JVM-side serve path against a numpy scorer, the corpus-independence
guarantee of the feature map (the train/serve-skew contract), the
zero-coefficient broadcast pruning, and the serve plan shape
(broadcast join, no cartesian)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from yelp_recommender_spark.operators.qualityclf import (
    hashed_token_features,
    score_quality,
    train_quality_classifier,
)

GOOD = ["lucid", "rigorous", "insight", "coherent", "evidence", "nuance"]
BAD = ["spam", "clickbait", "scam", "free", "winner", "pills"]
NOISE = ["the", "a", "of", "to", "and", "is", "it", "on"]
N_DIMS = 512


def _corpus(rng, n_docs, doc_len=30):
    """[(doc_id, label, [tokens])]: good docs mix GOOD+NOISE, bad docs
    BAD+NOISE, ~50/50."""
    docs = []
    for i in range(n_docs):
        label = i % 2
        vocab = (GOOD if label else BAD) + NOISE * 2
        toks = [vocab[j] for j in rng.integers(0, len(vocab), doc_len)]
        docs.append((i, label, toks))
    return docs


def _tokens_df(spark, docs):
    rows = [(d, t) for d, _, toks in docs for t in toks]
    return spark.createDataFrame(rows, "doc_id long, token string")


@pytest.fixture(scope="module")
def fitted(spark):
    rng = np.random.default_rng(42)
    docs = _corpus(rng, 240)
    train_docs = [d for d in docs if d[0] < 160]
    test_docs = [d for d in docs if d[0] >= 160]
    tokens = _tokens_df(spark, docs)
    labels = spark.createDataFrame(
        [(d, lbl) for d, lbl, _ in train_docs], "doc_id long, label int"
    )
    w, b = train_quality_classifier(
        tokens, labels, n_dims=N_DIMS, max_iter=50
    )
    return tokens, test_docs, w, b


def test_heldout_separation(spark, fitted):
    tokens, test_docs, w, b = fitted
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in score_quality(tokens, w, b).collect()
    }
    correct = sum(
        1
        for d, lbl, _ in test_docs
        if (scores[d] >= 0.5) == bool(lbl)
    )
    assert correct / len(test_docs) >= 0.9


def test_serve_path_matches_numpy(spark, fitted):
    tokens, _, w, b = fitted
    got = {
        r["doc_id"]: r["quality_score"]
        for r in score_quality(tokens, w, b).collect()
    }
    feats = hashed_token_features(tokens, n_dims=N_DIMS).collect()
    z = {}
    for r in feats:
        z[r["doc_id"]] = z.get(r["doc_id"], 0.0) + w[r["dim"]] * r["w"]
    for d, zz in z.items():
        want = 1.0 / (1.0 + np.exp(-(zz + b)))
        assert got[d] == pytest.approx(want, abs=2e-6)
    assert set(got) == set(z)


def test_features_are_corpus_independent(spark):
    """The train/serve-skew guarantee: a doc's features don't change
    when the surrounding corpus does (the reason the design has no
    IDF)."""
    docs = [(1, 0, ["alpha", "beta", "alpha", "the"])]
    other = [(2, 0, ["gamma"] * 7 + ["alpha"])]
    alone = {
        (r["dim"], round(r["w"], 12))
        for r in hashed_token_features(
            _tokens_df(spark, docs), n_dims=N_DIMS
        ).collect()
    }
    together = {
        (r["dim"], round(r["w"], 12))
        for r in hashed_token_features(
            _tokens_df(spark, docs + other), n_dims=N_DIMS
        )
        .filter(F.col("doc_id") == 1)
        .collect()
    }
    assert alone == together


def test_zero_weights_score_sigmoid_intercept(spark):
    tokens = _tokens_df(spark, [(1, 0, ["x", "y"]), (2, 0, ["z"])])
    out = score_quality(tokens, np.zeros(N_DIMS), 0.4, n_dims=N_DIMS)
    want = round(1.0 / (1.0 + np.exp(-0.4)), 6)
    for r in out.collect():
        assert r["quality_score"] == pytest.approx(want, abs=1e-6)


def test_weight_length_mismatch_raises(spark):
    tokens = _tokens_df(spark, [(1, 0, ["x"])])
    with pytest.raises(ValueError, match="dims"):
        score_quality(tokens, np.zeros(8), 0.0, n_dims=16)


def test_column_scorer_matches_long_form(spark, fitted):
    """The map-only per-row scorer and the broadcast long-form scorer
    compute the same function (ulp-level summation-order differences
    only)."""
    from yelp_recommender_spark.operators.qualityclf import (
        score_quality_col,
    )

    tokens, _, w, b = fitted
    texts = tokens.groupBy("doc_id").agg(
        F.concat_ws(" ", F.collect_list("token")).alias("text")
    )
    got = {
        r["doc_id"]: r["q"]
        for r in texts.select(
            "doc_id", score_quality_col("text", w, b).alias("q")
        ).collect()
    }
    want = {
        r["doc_id"]: r["quality_score"]
        for r in score_quality(tokens, w, b).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6)


def test_column_scorer_empty_text_and_plan(spark, fitted):
    _, _, w, b = fitted
    from yelp_recommender_spark.operators.qualityclf import (
        score_quality_col,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "...!!"), (3, "lucid insight"), (4, None)],
        "doc_id long, text string",
    ).select("doc_id", score_quality_col("text", w, b).alias("q"))
    rows = {r["doc_id"]: r["q"] for r in df.collect()}
    sig_b = round(float(1.0 / (1.0 + np.exp(-b))), 6)
    assert rows[1] == pytest.approx(sig_b, abs=1e-9)
    assert rows[2] == pytest.approx(sig_b, abs=1e-9)  # punct-only
    # NULL text must score sigma(intercept), never propagate NULL (a
    # NULL score silently passes every `score < threshold` drop-filter)
    assert rows[4] == pytest.approx(sig_b, abs=1e-9)
    assert rows[3] != rows[1]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle: pure map-side algebra
    with pytest.raises(ValueError, match="16384"):
        score_quality_col("text", np.zeros(20000), 0.0)


def test_column_scorer_tokenized_input_parity(spark, fitted):
    """tokenized=True over a pre-tokenized array column (incl. a NULL
    array) scores identically to the text path."""
    from yelp_recommender_spark.functions.text import tokens_col
    from yelp_recommender_spark.operators.qualityclf import (
        score_quality_col,
    )

    _, _, w, b = fitted
    df = spark.createDataFrame(
        [(1, "lucid rigorous spam"), (2, ""), (3, None)],
        "doc_id long, text string",
    ).withColumn(
        "toks",
        F.when(F.col("text").isNotNull(), tokens_col("text")),
    )
    rows = df.select(
        "doc_id",
        score_quality_col("text", w, b).alias("via_text"),
        score_quality_col("toks", w, b, tokenized=True).alias("via_toks"),
    ).collect()
    for r in rows:
        assert r["via_toks"] == pytest.approx(r["via_text"], abs=1e-9)


def test_column_scorer_streaming_parity(spark, fitted, tmp_path):
    """The per-row scorer is stateless column algebra, so it runs
    unchanged under readStream — scores equal the batch path's."""
    from pyspark.sql import types as T

    from yelp_recommender_spark.operators.qualityclf import (
        score_quality_col,
    )

    _, _, w, b = fitted
    src = str(tmp_path / "stream_src")
    rows = [(i, f"lucid insight doc{i} evidence") for i in range(20)] + [
        (100 + i, f"spam pills doc{i} winner") for i in range(20)
    ]
    batch_df = spark.createDataFrame(rows, "doc_id long, text string")
    batch_df.write.mode("overwrite").parquet(src)
    want = {
        r["doc_id"]: r["q"]
        for r in spark.read.parquet(src)
        .select("doc_id", score_quality_col("text", w, b).alias("q"))
        .collect()
    }
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .select("doc_id", score_quality_col("text", w, b).alias("q"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("qclf_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["q"]
        for r in spark.sql("select * from qclf_stream").collect()
    }
    assert got == want


def test_serve_plan_broadcasts_model(spark, fitted):
    tokens, _, w, b = fitted
    plan = (
        score_quality(tokens, w, b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
