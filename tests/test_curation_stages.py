"""End-to-end gates for the round-8 curate stages: the learned quality
filter (`--quality-model`), SemDeDup (`--semantic-dedup-eps`), and
cross-document repeated-span stripping (`--strip-spans-w`), plus their
CLI plumbing and argument validation."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)

BOILER = "all rights reserved unauthorized reproduction is strictly forbidden"


def _body(i, n=18):
    """Fully doc-unique lowercase body — survives quality heuristics,
    sits at zero cross-doc token overlap (so the only recurring windows
    are the planted boilerplate's), incl. the boundary windows that
    straddle boilerplate into body."""
    return " ".join(f"tail{i}w{j}" for j in range(n))


def _write_docs(spark, tmp_path, rows, name="docs.parquet"):
    p = str(tmp_path / name)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(p)
    return p


# ------------------------------------------------------------ span stripping
def test_curate_strips_cross_doc_boilerplate(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus

    n_boiler = 6
    rows = [
        (i, f"{BOILER} {_body(i)}", "en", "srcA") for i in range(n_boiler)
    ] + [(100 + i, _body(50 + i), "en", "srcA") for i in range(4)]
    src = _write_docs(spark, tmp_path, rows)
    out = str(tmp_path / "out")
    report = curate_corpus(
        spark, src, out, seq_len=64, strip_spans_w=5
    )
    n_bt = len(BOILER.split())
    assert report["n_docs_span_stripped"] == n_boiler
    assert report["n_tokens_span_stripped"] == n_boiler * n_bt
    docs = {
        r.doc_id: r
        for r in spark.read.parquet(os.path.join(out, "documents")).collect()
    }
    for i in range(n_boiler):
        assert "reserved" not in docs[i].text  # boilerplate gone
        assert f"tail{i}w0" in docs[i].text  # unique body intact
        assert docs[i].n_tokens == len(_body(i).split())
    for i in range(4):  # untouched docs keep their original text
        assert docs[100 + i].text == _body(50 + i)

    # off by default: same corpus, no stripping
    report2 = curate_corpus(
        spark, src, str(tmp_path / "out2"), seq_len=64
    )
    assert report2["n_docs_span_stripped"] == 0
    assert report2["n_tokens_span_stripped"] == 0


def test_strip_reapplies_min_tokens_floor(spark, tmp_path):  # noqa: F811
    """A doc that is MOSTLY shared boilerplate can fall below the
    quality gate's min_tokens after stripping — it must not ship."""
    from yelp_recommender_spark.curate import curate_corpus

    rows = [
        # 8 boilerplate tokens + 2-token unique tails: below
        # min_tokens=5 once stripped
        (i, f"{BOILER} only{i} two{i}", "en", "srcA") for i in range(3)
    ] + [(100 + i, _body(i), "en", "srcA") for i in range(4)]
    src = _write_docs(spark, tmp_path, rows)
    out = str(tmp_path / "out")
    report = curate_corpus(
        spark, src, out, seq_len=64, strip_spans_w=5, min_tokens=5
    )
    assert report["n_span_stripped_below_min"] == 3
    kept = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "documents")).collect()
    }
    assert kept == {100, 101, 102, 103}


# ----------------------------------------------------- learned quality filter
def test_curate_learned_quality_filter(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus
    from yelp_recommender_spark.operators.qualityclf import (
        save_model,
        train_quality_classifier,
    )

    good_vocab = ["lucid", "rigorous", "insight", "coherent", "evidence"]
    bad_vocab = ["spam", "clickbait", "scam", "winner", "pills"]
    rng = np.random.default_rng(3)

    def text(i, vocab):
        toks = [vocab[j] for j in rng.integers(0, len(vocab), 20)]
        return " ".join(toks + [f"doc{i}mark{j}" for j in range(6)])

    rows = [(i, text(i, good_vocab), "en", "srcA") for i in range(40)] + [
        (100 + i, text(100 + i, bad_vocab), "en", "srcA") for i in range(40)
    ]
    src = _write_docs(spark, tmp_path, rows)

    docs = spark.read.parquet(src)
    from yelp_recommender_spark.functions.text import tokens_col

    tokens = docs.select(
        "doc_id", F.explode(tokens_col("text")).alias("token")
    )
    # train on half the docs; curate filters the whole corpus
    labels = spark.createDataFrame(
        [(i, 1) for i in range(20)] + [(100 + i, 0) for i in range(20)],
        "doc_id long, label int",
    )
    w, b = train_quality_classifier(tokens, labels, n_dims=512, max_iter=50)
    model_path = str(tmp_path / "quality.json")
    save_model(model_path, w, b)

    out = str(tmp_path / "out")
    report = curate_corpus(
        spark, src, out, seq_len=64,
        quality_model_path=model_path, quality_min_score=0.5,
    )
    kept = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "documents")).collect()
    }
    assert report["n_quality_model_filtered"] >= 35  # bad docs dropped
    assert all(i in kept for i in range(40))  # good docs all survive
    assert sum(1 for i in range(40) if 100 + i in kept) <= 5


def test_quality_model_round_trip_and_format_guard(tmp_path):
    from yelp_recommender_spark.operators.qualityclf import (
        load_model,
        save_model,
    )

    w = np.arange(8, dtype=np.float64) / 7.0
    p = str(tmp_path / "m.json")
    save_model(p, w, -0.25)
    w2, b2 = load_model(p)
    assert np.array_equal(w, w2) and b2 == -0.25
    with open(p, "w") as f:
        json.dump({"format": "other"}, f)
    with pytest.raises(ValueError, match="qualityclf-v1"):
        load_model(p)


# -------------------------------------------------------------- SemDeDup stage
def test_curate_semantic_dedup_stage(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus

    rows = [(i, _body(i), "en", "srcA") for i in range(6)]
    src = _write_docs(spark, tmp_path, rows)
    # docs 0/1: cosine ~0.96 twins (below the 0.999 pairwise threshold,
    # inside SemDeDup's eps=0.1 -> tau=0.9); others orthogonal-ish;
    # doc 5 has no vector and must pass unchecked
    base = np.eye(8)
    twins = [
        (base[0] + 0.3 * base[7]) / np.linalg.norm(base[0] + 0.3 * base[7]),
        base[0],
    ]
    emb_rows = [
        (0, twins[0].tolist()),
        (1, twins[1].tolist()),
        (2, base[2].tolist()),
        (3, base[3].tolist()),
        (4, base[4].tolist()),
    ]
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        emb_rows, "doc_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(emb)

    out = str(tmp_path / "out")
    report = curate_corpus(
        spark, src, out, seq_len=64,
        embeddings_path=emb, embedding_threshold=0.999,
        semantic_eps=0.1, semantic_clusters=2,
    )
    assert report["n_embedding_dup_rejected"] == 0  # pairwise stage idle
    assert report["n_semantic_rejected"] == 1
    kept = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "documents")).collect()
    }
    assert len(kept & {0, 1}) == 1  # one twin survives
    assert {2, 3, 4, 5} <= kept  # incl. the vectorless doc 5


def test_semantic_eps_requires_embeddings(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus

    src = _write_docs(
        spark, tmp_path, [(1, _body(1), "en", "srcA")]
    )
    with pytest.raises(ValueError, match="semantic_eps"):
        curate_corpus(
            spark, src, str(tmp_path / "o"), semantic_eps=0.1
        )


# ----------------------------------------------------------------- CLI plumbing
def test_cli_quality_train_then_curate(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark import cli

    rng = np.random.default_rng(9)
    good = ["lucid", "rigorous", "insight"]
    bad = ["spam", "scam", "pills"]

    def text(i, vocab):
        toks = [vocab[j] for j in rng.integers(0, len(vocab), 15)]
        return " ".join(toks + [f"cli{i}tok{j}" for j in range(6)])

    rows = [(i, text(i, good), "en", "srcA") for i in range(20)] + [
        (50 + i, text(50 + i, bad), "en", "srcA") for i in range(20)
    ]
    src = _write_docs(spark, tmp_path, rows)
    labels = str(tmp_path / "labels.parquet")
    spark.createDataFrame(
        [(i, 1) for i in range(10)] + [(50 + i, 0) for i in range(10)],
        "doc_id long, label int",
    ).write.mode("overwrite").parquet(labels)

    model = str(tmp_path / "model.json")
    cli.main([
        "quality-train", "--input", src, "--labels", labels,
        "--model-out", model, "--n-dims", "256", "--max-iter", "40",
    ])
    assert os.path.exists(model)

    out = str(tmp_path / "out")
    cli.main([
        "curate", "--input", src, "--output", out, "--seq-len", "64",
        "--quality-model", model, "--strip-spans-w", "5",
    ])
    kept = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "documents")).collect()
    }
    assert all(i in kept for i in range(20))
    assert sum(1 for i in range(20) if 50 + i in kept) <= 3


# ------------------------------------------------------------ DSIR selection
def _dsir_body(i, voc):
    """Half topic-vocabulary, half doc-unique filler: the unique tokens
    kill exact/near-dup overlap between docs (every shingle straddles
    one) while the vocab half carries the distribution DSIR learns."""
    toks = []
    for j in range(20):
        toks.append(
            voc[(i + j * (i + 1)) % len(voc)] if j % 2 == 0 else f"u{i}x{j}"
        )
    return " ".join(toks)


def test_curate_dsir_selection_stage(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus

    voc_a = ["protein", "enzyme", "binding", "assay", "fold", "kinetics"]
    voc_b = ["season", "coach", "ballot", "senate", "quarterback", "goal"]
    raw = _write_docs(
        spark,
        tmp_path,
        [(i, _dsir_body(i, voc_a), "en", "srcA") for i in range(20)]
        + [(100 + i, _dsir_body(i, voc_b), "en", "srcB") for i in range(30)],
    )
    target = _write_docs(
        spark,
        tmp_path,
        [
            (1000 + i, " ".join(voc_a[(i + j) % 6] for j in range(20)),
             "en", "tgt")
            for i in range(8)
        ],
        name="target.parquet",
    )
    out = str(tmp_path / "out_dsir")
    report = curate_corpus(
        spark, raw, out, seq_len=64,
        dsir_target_path=target, dsir_keep=15, dsir_dim=4096,
    )
    assert report["n_dsir_rejected"] == 50 - 15
    assert report["n_curated"] == 15
    kept = [
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "documents")).collect()
    ]
    assert len(kept) == 15
    # the importance-weight gap between on- and off-target docs dwarfs
    # the Gumbel noise: the budget goes to the target-like docs
    assert len([i for i in kept if i < 100]) >= 13


def test_dsir_knobs_go_together(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus

    src = _write_docs(
        spark, tmp_path, [(1, _dsir_body(1, ["alpha", "beta"]), "en", "s")]
    )
    with pytest.raises(ValueError, match="dsir_target_path and dsir_keep"):
        curate_corpus(
            spark, src, str(tmp_path / "o1"), dsir_target_path=src
        )
    with pytest.raises(ValueError, match="dsir_target_path and dsir_keep"):
        curate_corpus(spark, src, str(tmp_path / "o2"), dsir_keep=5)
