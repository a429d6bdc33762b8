"""Curation operators: distributed prefix sum correctness (vs the
single-partition window ground truth), sequence-packing invariants, PII
redaction semantics on literal fixtures, repetition metrics, shard-shuffle
structure, and the sketch accuracy gate."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)


# ---------------------------------------------------------------- prefix sum
def test_prefix_sum_matches_global_window(spark):  # noqa: F811
    from yelp_recommender_spark.operators.prefix import with_prefix_sum

    # deliberately unsorted, multi-partition, irregular values
    df = (
        spark.range(0, 1000)
        .withColumn("k", (F.col("id") * 7919) % 1000)  # permuted order key
        .withColumn("v", (F.col("id") % 13) + 1)
        .select("k", "v")
        .repartition(17)
    )
    got = {
        r.k: r.ps
        for r in with_prefix_sum(df, "k", "v", "ps", n_buckets=8).collect()
    }
    want = {
        r.k: r.ps
        for r in df.withColumn(
            "ps", F.sum("v").over(Window.orderBy("k"))
        ).collect()
    }
    assert got == want


def test_prefix_sum_single_bucket_and_tiny_input(spark):  # noqa: F811
    from yelp_recommender_spark.operators.prefix import with_prefix_sum

    df = spark.createDataFrame([(1, 10), (2, 5), (3, 1)], "k int, v int")
    rows = {
        r.k: r.ps
        for r in with_prefix_sum(df, "k", "v", "ps", n_buckets=1).collect()
    }
    assert rows == {1: 10, 2: 15, 3: 16}
    # more buckets than rows — empty buckets must not break anything
    rows = {
        r.k: r.ps
        for r in with_prefix_sum(df, "k", "v", "ps", n_buckets=64).collect()
    }
    assert rows == {1: 10, 2: 15, 3: 16}


def test_prefix_sum_string_order_key(spark):  # noqa: F811
    """String order keys (legal doc_ids everywhere in the engine) must
    bucket through the monotone code-point surrogate, not an ANSI
    double-cast (r8 fix) — answer identical to the global window."""
    from yelp_recommender_spark.operators.prefix import with_prefix_sum

    rows = [(f"doc{i:04d}" if i % 3 else f"a{i:04d}", (i % 7) + 1)
            for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v int").repartition(9)
    got = {
        r.k: r.ps
        for r in with_prefix_sum(df, "k", "v", "ps", n_buckets=8).collect()
    }
    want = {
        r.k: r.ps
        for r in df.withColumn(
            "ps", F.sum("v").over(Window.orderBy("k"))
        ).collect()
    }
    assert got == want


def test_prefix_sum_no_single_partition_data_window(spark):  # noqa: F811
    """The data-path window must be partitioned (by bucket); only the
    O(n_buckets) totals reduction may run unpartitioned."""
    from yelp_recommender_spark.operators.prefix import with_prefix_sum

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    plan = with_prefix_sum(df, "k", "v", "ps", n_buckets=8)._jdf.queryExecution().executedPlan().toString()
    # every Window over the full input must carry a partition spec; the
    # unpartitioned one operates on the 8-row bucket-totals aggregate,
    # which appears AFTER an aggregate in the plan. Heuristic gate: at
    # least one Window partitioned by the bucket column exists.
    assert "_bucket" in plan


# ------------------------------------------------------------------ packing
def test_sequence_packing_invariants(spark):  # noqa: F811
    from yelp_recommender_spark.queries.curation import (
        _SEQ_LEN,
        q75_sequence_packing,
    )

    rows = q75_sequence_packing(spark, SF_DIR).orderBy("doc_id").collect()
    assert rows, "packing produced no rows"
    # blocks advance monotonically with doc order and cover contiguously
    prev_last = None
    total_tokens = 0
    for r in rows:
        assert r.n_blocks == r.last_block - r.first_block + 1 >= 1
        if prev_last is not None:
            assert r.first_block in (prev_last, prev_last + 1)
        prev_last = r.last_block
        total_tokens += r.n_tokens
    # final block index is exactly where the concatenated corpus ends
    assert rows[-1].last_block == (total_tokens - 1) // _SEQ_LEN
    assert rows[0].first_block == 0


# ---------------------------------------------------------------- redaction
def test_pii_redaction_literals(spark):  # noqa: F811
    from yelp_recommender_spark.queries.curation import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
    )

    df = spark.createDataFrame(
        [
            ("write bob.smith+x@corp.example.org or call 555-123-4567",),
            ("server at 192.168.0.1 and 10.0.255.7 no mail",),
            ("clean text",),
            ("Mixed Case: John.Doe@Corp.COM stays private",),
        ],
        "text string",
    )
    red = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", EMAIL_RE, "<EMAIL>"),
                PHONE_RE,
                "<PHONE>",
            ),
            IPV4_RE,
            "<IP>",
        ).alias("r")
    ).collect()
    assert red[0].r == "write <EMAIL> or call <PHONE>"
    assert red[1].r == "server at <IP> and <IP> no mail"
    assert red[2].r == "clean text"
    assert red[3].r == "Mixed Case: <EMAIL> stays private"


def test_pii_redaction_catalog_leaves_no_ips(spark):  # noqa: F811
    from yelp_recommender_spark.queries.curation import q74_pii_redaction

    out = q74_pii_redaction(spark, SF_DIR)
    assert out.filter(F.col("n_ips_remaining") > 0).count() == 0
    # the planted fixture must actually fire
    assert out.filter(F.col("n_emails") > 0).count() > 0
    assert out.filter(F.col("n_phones") > 0).count() > 0


# --------------------------------------------------------------- repetition
def test_repetition_metrics_literal(spark):  # noqa: F811
    # the SHARED builders (same expressions q73 and the curate pipeline
    # run): "a a a b" → top_token_frac 0.75, bigrams [a a, a a, a b] →
    # dup fraction 1 - 2/3
    from yelp_recommender_spark.functions.curation import (
        dup_bigram_fraction,
        top_token_count,
    )
    from yelp_recommender_spark.functions.text import tokens_col

    df = spark.createDataFrame(
        [("a a a b",), ("one",)], "text string"
    ).withColumn("toks", tokens_col("text"))
    rows = df.select(
        F.round(top_token_count("toks") / F.size("toks"), 6).alias("t"),
        F.round(dup_bigram_fraction("toks"), 6).alias("d"),
    ).collect()
    assert rows[0].t == 0.75
    assert rows[0].d == round(1 - 2 / 3, 6)
    assert rows[1].t == 1.0
    assert rows[1].d is None  # single token: no bigrams → NULL, not 0


# ------------------------------------------------------------ shard shuffle
def test_global_shuffle_structure(spark):  # noqa: F811
    from yelp_recommender_spark.queries.curation import (
        _N_SHARDS,
        q77_global_shuffle,
    )

    rows = q77_global_shuffle(spark, SF_DIR).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    assert set(by_shard) <= set(range(_N_SHARDS))
    assert len(by_shard) > 1  # hash actually spreads
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic across invocations
    again = q77_global_shuffle(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# ------------------------------------------------------------------- sketch
def test_sketch_distinct_gate(spark):  # noqa: F811
    from yelp_recommender_spark.queries.events import q80_sketch_distinct

    rows = q80_sketch_distinct(spark, SF_DIR).collect()
    assert rows and all(r.approx_ok for r in rows)


# ---------------------------------------------------------- decontamination
def test_decontamination_bounds(spark):  # noqa: F811
    from yelp_recommender_spark.queries.curation import q78_decontamination

    rows = q78_decontamination(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_grams
        assert abs(r.contamination_rate - round(r.n_contaminated / r.n_grams, 6)) < 1e-9


# ----------------------------------------------------------------- pipeline
def test_curate_corpus_end_to_end(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus

    out = str(tmp_path / "curated")
    report = curate_corpus(
        spark,
        SF_DIR,
        out,
        seq_len=128,
        benchmark_source="src0",
    )
    # stage counts monotonically decrease through the funnel
    assert (
        report["n_input"]
        >= report["n_after_quality"]
        >= report["n_after_exact_dedup"]
        >= report["n_curated"]
        > 0
    )
    assert report["n_training_blocks"] > 0

    docs = spark.read.parquet(out + "/documents")
    assert docs.count() == report["n_curated"]
    # benchmark source fully excluded from the training corpus
    assert docs.filter(F.col("source") == "src0").count() == 0
    # the decontam gram join consulted the sketch-backed planner and
    # the decision is in the report (test-scale benchmark gram set is
    # small → broadcast, decided without scanning the training side)
    plan = report["decontam_join_plan"]
    assert plan is not None and plan["strategy"] == "broadcast"
    assert plan["n_right"] > 0
    # no exact duplicates survive
    assert (
        docs.groupBy(F.md5("text")).count().filter(F.col("count") > 1).count()
        == 0
    )

    packed = spark.read.parquet(out + "/packing")
    assert packed.count() == report["n_curated"]
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert report["n_training_blocks"] == (total_tokens - 1) // 128 + 1

    mix = spark.read.parquet(out + "/mixture")
    weights = [r.mix_weight for r in mix.collect()]
    assert abs(sum(weights) - 1.0) < 1e-4


def test_cli_curate_smoke(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark import cli

    out = str(tmp_path / "cli_curated")
    cli.main(["curate", "--input", SF_DIR, "--output", out, "--seq-len", "512"])
    assert spark.read.parquet(out + "/documents").count() > 0
    assert spark.read.parquet(out + "/packing").count() > 0


def test_prefix_sum_empty_input(spark):  # noqa: F811
    from yelp_recommender_spark.operators.prefix import with_prefix_sum

    empty = spark.range(0).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    assert with_prefix_sum(empty, "k", "v", "ps", n_buckets=4).collect() == []


def test_curate_synthetic_source(spark, tmp_path):  # noqa: F811
    """curate over the generating data source: planted duplicates must be
    removed; scale is a read option, not a fixture."""
    from yelp_recommender_spark.curate import curate_corpus

    out = str(tmp_path / "synth_curated")
    report = curate_corpus(
        spark,
        "synthetic:rows=3000,partitions=8,dup_rate=0.2",
        out,
        seq_len=256,
    )
    assert report["n_input"] == 3000
    assert report["n_after_exact_dedup"] < report["n_after_quality"]
    docs = spark.read.parquet(out + "/documents")
    assert (
        docs.groupBy("text").count().filter(F.col("count") > 1).count() == 0
    )


def test_curate_empty_survivors(spark, tmp_path):  # noqa: F811
    """An over-aggressive quality gate must degrade to empty outputs and
    zeroed stage counts, never crash (empty-input contract through the
    whole operator chain: dedup, components, prefix sum, packing)."""
    from yelp_recommender_spark.curate import curate_corpus

    report = curate_corpus(
        spark, SF_DIR, str(tmp_path / "none"), min_tokens=10**9
    )
    assert report["n_input"] > 0
    assert report["n_after_quality"] == 0
    assert report["n_curated"] == 0
    assert report["n_training_blocks"] == 0


def test_curate_lm_perplexity_filter(spark, tmp_path):  # noqa: F811
    """The optional bigram-LM stage drops off-distribution documents: a
    corpus of near-identical English sentences plus one gibberish doc —
    the gibberish scores far more bits/token under the corpus LM."""
    import os

    from yelp_recommender_spark.curate import curate_corpus

    src = str(tmp_path / "docs.parquet")
    rows = [
        (i, f"the quick brown fox jumps over the lazy dog number {i}",
         "en", "srcA")
        for i in range(30)
    ]
    rows.append((99, "zxqv kjh wqpo mnvb asdf zzkq pqwl xcvb rrtq yulp",
                 "en", "srcA"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "lm_out")
    # near_dup_threshold=0.99: the sentence variants sit at Jaccard ~0.8
    # and must SURVIVE dedup here, so the LM trains on the full corpus
    # (a 2-doc survivor set has no "normal" to learn)
    report = curate_corpus(
        spark, src, out, seq_len=64,
        near_dup_threshold=0.99, max_bits_per_token=3.0,
    )
    assert report["n_lm_filtered"] >= 1
    kept = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "documents")).collect()
    }
    assert 99 not in kept
    assert len(kept) >= 25  # the ordinary sentences survive

    # disabled by default: same corpus keeps the gibberish doc
    out2 = str(tmp_path / "nolm_out")
    report2 = curate_corpus(
        spark, src, out2, seq_len=64, near_dup_threshold=0.99
    )
    assert report2["n_lm_filtered"] == 0
    kept2 = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out2, "documents")).collect()
    }
    assert 99 in kept2


def test_curate_cli_standing_corpus_rejects_prior_run_dups(
    spark, tmp_path
):  # noqa: F811
    """VERDICT r4 #7: the curate CLI's --corpus-index mode is the
    production ingest loop — run 2 must reject duplicates of run 1's
    survivors via the PERSISTED band-key index, and only novel docs may
    survive and be appended."""
    import json

    from yelp_recommender_spark import cli

    def _doc(i, words):
        return (i, " ".join(words), "en", "web")

    base_words = [
        ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs",
         f"tail{i}", "tonight"]
        for i in range(6)
    ]
    run1 = [_doc(i, base_words[i]) for i in range(6)]
    # run 2: 3 exact copies of run-1 texts (new ids) + 3 genuinely novel
    novel_words = [
        ["galaxies", "rotate", "slowly", "beneath", "ancient", "silent",
         "telescopes", "watching", f"star{i}", "maps"]
        for i in range(3)
    ]
    run2 = [_doc(100 + i, base_words[i]) for i in range(3)] + [
        _doc(200 + i, novel_words[i]) for i in range(3)
    ]
    schema = "doc_id long, text string, lang string, source string"
    p1 = str(tmp_path / "run1.parquet")
    p2 = str(tmp_path / "run2.parquet")
    spark.createDataFrame(run1, schema).write.parquet(p1)
    spark.createDataFrame(run2, schema).write.parquet(p2)

    idx = str(tmp_path / "corpus_index")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    cli.main(
        ["curate", "--input", p1, "--output", out1, "--corpus-index", idx]
    )
    # index now holds run 1's survivors + the family meta
    assert json.load(open(idx + "/meta.json"))["bands"] == 16
    n_idx_docs = (
        spark.read.parquet(idx + "/band_keys").select("doc_id").distinct()
    ).count()
    assert n_idx_docs == 6

    cli.main(
        ["curate", "--input", p2, "--output", out2, "--corpus-index", idx]
    )
    survivors2 = {
        r.doc_id for r in spark.read.parquet(out2 + "/documents").collect()
    }
    assert survivors2 == {200, 201, 202}  # copies rejected, novel kept
    # index grew by exactly the novel survivors
    n_idx_after = (
        spark.read.parquet(idx + "/band_keys").select("doc_id").distinct()
    ).count()
    assert n_idx_after == 9


def test_curate_standing_corpus_report_counts(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus

    docs = [
        (i, f"alpha beta gamma delta epsilon zeta unique{i} end", "en", "w")
        for i in range(4)
    ]
    p = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.parquet(p)
    idx = str(tmp_path / "idx")
    r1 = curate_corpus(
        spark, p, str(tmp_path / "o1"), corpus_index_dir=idx
    )
    assert r1["n_near_dup_rejected"] == 0 and r1["corpus_index"] == idx
    # identical batch under new ids: every doc rejected by the index
    docs2 = [(10 + i, t, la, s) for (i, t, la, s) in docs]
    p2 = str(tmp_path / "in2.parquet")
    spark.createDataFrame(
        docs2, "doc_id long, text string, lang string, source string"
    ).write.parquet(p2)
    r2 = curate_corpus(
        spark, p2, str(tmp_path / "o2"), corpus_index_dir=idx
    )
    assert r2["n_near_dup_rejected"] == 4
    assert r2["n_curated"] == 0


def test_corpus_index_guards_reject_bad_state(spark, tmp_path):  # noqa: F811
    """The standing index refuses silently-wrong states: data without
    provenance (no meta.json) and a torn update (band_keys/shingles
    covering different doc sets) both raise instead of admitting dups."""
    import json
    import shutil

    import pytest

    from yelp_recommender_spark.curate import curate_corpus

    docs = [
        (i, f"red orange yellow green blue indigo violet mark{i}", "en", "w")
        for i in range(3)
    ]
    p = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.parquet(p)

    idx = str(tmp_path / "idx")
    curate_corpus(spark, p, str(tmp_path / "o1"), corpus_index_dir=idx)

    # 1) provenance gone: data present, meta absent → reject
    import os

    os.remove(idx + "/meta.json")
    with pytest.raises(ValueError, match="no\\s+meta.json"):
        curate_corpus(spark, p, str(tmp_path / "o2"), corpus_index_dir=idx)
    with open(idx + "/meta.json", "w") as f:
        json.dump({"n_hashes": 64, "bands": 16, "fast": True}, f)

    # 2) wrong family → reject
    with open(idx + "/meta.json", "w") as f:
        json.dump({"n_hashes": 16, "bands": 8, "fast": False}, f)
    with pytest.raises(ValueError, match="built with"):
        curate_corpus(spark, p, str(tmp_path / "o3"), corpus_index_dir=idx)
    with open(idx + "/meta.json", "w") as f:
        json.dump({"n_hashes": 64, "bands": 16, "fast": True}, f)

    # 3) torn update: drop the shingles table → reject
    shutil.rmtree(idx + "/shingles")
    spark.createDataFrame(
        [], "doc_id long, shingles array<string>"
    ).write.parquet(idx + "/shingles")
    with pytest.raises(ValueError, match="torn"):
        curate_corpus(spark, p, str(tmp_path / "o4"), corpus_index_dir=idx)


def test_first_ingest_crash_is_harmless(spark, tmp_path):  # noqa: F811
    """ADVICE r5: a crash during the FIRST-ever ingest (data written,
    commit marker not yet dropped) must leave the same harmless shape as
    any later crash — stray run ignored, next ingest proceeds — not the
    'pre-commit-log layout' rejection. commits/ is created before any
    data write precisely so this state is distinguishable from an index
    written without a commit log at all."""
    import os

    from yelp_recommender_spark.curate import (
        _load_standing_index,
        curate_corpus,
    )

    docs = [
        (i, f"one two three four five six seven eight niner{i}", "en", "w")
        for i in range(3)
    ]
    p = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.parquet(p)

    # simulate the mid-first-ingest crash state the fixed ordering
    # produces: meta + empty commits/ + stray run data, no marker
    idx = str(tmp_path / "idx")
    from yelp_recommender_spark.curate import _write_index_meta

    _write_index_meta(idx)
    os.makedirs(idx + "/commits")
    spark.createDataFrame(
        [(0, "deadbeef")], "doc_id long, band_key string"
    ).write.parquet(idx + "/band_keys/run_id=crashed")
    spark.createDataFrame(
        [(0, ["a b c"])], "doc_id long, shingles array<string>"
    ).write.parquet(idx + "/shingles/run_id=crashed")

    assert _load_standing_index(spark, idx) is None  # stray run ignored
    r = curate_corpus(spark, p, str(tmp_path / "o1"), corpus_index_dir=idx)
    assert r["n_curated"] == 3  # first real ingest proceeds normally

    # an index with band-key data but NO commit log at all is still the
    # unknown-provenance rejection (that guard must survive the fix)
    import shutil

    shutil.rmtree(idx + "/commits")
    import pytest

    with pytest.raises(ValueError, match="no commit log"):
        _load_standing_index(spark, idx)


# ------------------------------------------------- embedding near-dup stage
def _emb_dedup_fixture(spark, tmp_path):
    """8 text-distinct docs (every earlier stage keeps all of them) with
    planted embedding clusters: docs 0-4 share one vector (a 5-doc
    near-dup cluster), docs 5-7 are mutually orthogonal."""
    words = [
        ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"],
        ["golf", "hotel", "india", "juliet", "kilo", "lima"],
        ["mike", "november", "oscar", "papa", "quebec", "romeo"],
        ["sierra", "tango", "uniform", "victor", "whiskey", "xray"],
        ["yankee", "zulu", "apple", "banana", "cherry", "date"],
        ["elder", "fig", "grape", "honey", "iris", "jade"],
        ["kale", "lemon", "mango", "nectar", "olive", "peach"],
        ["quince", "rose", "sage", "thyme", "umber", "vine"],
    ]
    docs = [(i, " ".join(w), "en", "web") for i, w in enumerate(words)]
    p_docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(p_docs)
    vecs = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)]
    vecs += [(5, [0.0, 1.0, 0.0, 0.0]), (6, [0.0, 0.0, 1.0, 0.0]),
             (7, [0.0, 0.0, 0.0, 1.0])]
    p_emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        vecs, "doc_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(p_emb)
    return p_docs, p_emb


def test_curate_embedding_dedup_bounded_with_audit(spark, tmp_path):  # noqa: F811
    """VERDICT r6 #1: the curate pipeline's embedding-dedup stage runs
    the BOUNDED O(n·k) contract by default and persists the exclusion
    audit next to the outputs — with k=2 against a 5-doc cluster, every
    cluster member has n_above=4, keeps 2 partners, and the audit counts
    the 2 it dropped; the cluster still resolves to one representative."""
    import os

    from yelp_recommender_spark.curate import curate_corpus

    p_docs, p_emb = _emb_dedup_fixture(spark, tmp_path)
    out = str(tmp_path / "out")
    report = curate_corpus(
        spark, p_docs, out,
        embeddings_path=p_emb, embedding_threshold=0.9,
        max_pairs_per_doc=2,
    )
    # docs 1-4 collapse onto representative 0; 5-7 untouched
    assert report["n_embedding_dup_rejected"] == 4
    kept = {
        r.doc_id
        for r in spark.read.parquet(out + "/documents").collect()
    }
    assert kept == {0, 5, 6, 7}
    # report carries the exclusion accounting (the pytest pin the
    # verdict asked for: the truncation is measurable from the report)
    ed = report["embedding_dedup"]
    assert ed["max_pairs_per_doc"] == 2
    assert ed["n_docs_with_partners"] == 5
    assert ed["n_docs_truncated"] == 5  # every member dropped 2 of 4
    assert ed["n_pairs_excluded"] == 10
    # the persisted audit artifact agrees row-by-row
    audit = spark.read.parquet(os.path.join(out, "embedding_dedup_audit"))
    rows = {r.doc_id: r for r in audit.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    for r in rows.values():
        assert (r.n_above, r.n_kept, r.n_excluded) == (4, 2, 2)


def test_curate_embedding_dedup_unbounded_optout(spark, tmp_path):  # noqa: F811
    """max_pairs_per_doc=None is the explicit opt-out into the exact
    unbounded contract: same survivors, no audit artifact (nothing is
    excluded), report records the mode."""
    import os

    from yelp_recommender_spark.curate import curate_corpus

    p_docs, p_emb = _emb_dedup_fixture(spark, tmp_path)
    out = str(tmp_path / "out_unbounded")
    report = curate_corpus(
        spark, p_docs, out,
        embeddings_path=p_emb, embedding_threshold=0.9,
        max_pairs_per_doc=None,
    )
    assert report["n_embedding_dup_rejected"] == 4
    assert report["embedding_dedup"]["max_pairs_per_doc"] is None
    assert not os.path.exists(os.path.join(out, "embedding_dedup_audit"))
    kept = {
        r.doc_id
        for r in spark.read.parquet(out + "/documents").collect()
    }
    assert kept == {0, 5, 6, 7}


def test_curate_cli_embedding_flags(spark, tmp_path):  # noqa: F811
    """The CLI surface of the bounded contract: --embeddings +
    --max-pairs-per-doc reach the pipeline, the audit artifact lands
    next to the outputs, and --max-pairs-per-doc 0 means unbounded."""
    import os

    from yelp_recommender_spark import cli

    p_docs, p_emb = _emb_dedup_fixture(spark, tmp_path)
    out = str(tmp_path / "cli_out")
    cli.main([
        "curate", "--input", p_docs, "--output", out,
        "--embeddings", p_emb, "--embedding-threshold", "0.9",
        "--max-pairs-per-doc", "2",
    ])
    assert os.path.exists(os.path.join(out, "embedding_dedup_audit"))
    kept = {
        r.doc_id
        for r in spark.read.parquet(out + "/documents").collect()
    }
    assert kept == {0, 5, 6, 7}


# -------------------------------------------------- crash-replay (ingest)
def test_curate_crash_between_append_and_commit_replays_clean(
    spark, tmp_path, monkeypatch
):  # noqa: F811
    """VERDICT r6 #7: end-to-end crash-replay on the real CLI path — a
    run killed BETWEEN the index data append and the commit marker
    leaves stray run data that the re-run ignores; after the re-run the
    survivor set and the committed index equal a never-crashed twin's."""
    import builtins
    import os

    import pytest

    from yelp_recommender_spark import cli

    def _doc(i, words):
        return (i, " ".join(words), "en", "web")

    base = [
        ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs",
         f"tail{i}", "tonight"]
        for i in range(4)
    ]
    novel = [
        ["galaxies", "rotate", "slowly", "beneath", "ancient", "silent",
         "telescopes", "watching", f"star{i}", "maps"]
        for i in range(2)
    ]
    run1 = [_doc(i, base[i]) for i in range(4)]
    run2 = [_doc(100 + i, base[i]) for i in range(2)] + [
        _doc(200 + i, novel[i]) for i in range(2)
    ]
    schema = "doc_id long, text string, lang string, source string"
    p1, p2 = str(tmp_path / "r1.parquet"), str(tmp_path / "r2.parquet")
    spark.createDataFrame(run1, schema).write.parquet(p1)
    spark.createDataFrame(run2, schema).write.parquet(p2)

    idx = str(tmp_path / "idx")
    idx_twin = str(tmp_path / "idx_twin")
    # run 1 commits normally on both indexes
    cli.main(["curate", "--input", p1, "--output",
              str(tmp_path / "o1"), "--corpus-index", idx])
    cli.main(["curate", "--input", p1, "--output",
              str(tmp_path / "t1"), "--corpus-index", idx_twin])

    # run 2 on idx: crash AFTER the run-2 data append, BEFORE the commit
    # marker — intercept exactly the marker open() on the real code path
    real_open = builtins.open

    def crash_on_marker(path, *a, **k):
        if (
            isinstance(path, (str, os.PathLike))
            and os.sep + "commits" + os.sep in str(path)
            and a[:1] == ("w",)
        ):
            raise RuntimeError("simulated crash before commit marker")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", crash_on_marker)
    with pytest.raises(RuntimeError, match="simulated crash"):
        cli.main(["curate", "--input", p2, "--output",
                  str(tmp_path / "o2_crashed"), "--corpus-index", idx])
    monkeypatch.setattr(builtins, "open", real_open)

    # stray uncommitted run data exists; committed view unchanged
    runs_on_disk = set(os.listdir(idx + "/band_keys"))
    committed = {
        f"run_id={r}" for r in os.listdir(idx + "/commits")
    }
    assert committed < runs_on_disk  # at least one stray run

    # re-run the same batch; twin never crashed
    cli.main(["curate", "--input", p2, "--output",
              str(tmp_path / "o2"), "--corpus-index", idx])
    cli.main(["curate", "--input", p2, "--output",
              str(tmp_path / "t2"), "--corpus-index", idx_twin])

    surv = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "o2/documents")).collect()
    }
    surv_twin = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "t2/documents")).collect()
    }
    assert surv == surv_twin == {200, 201}  # copies rejected, novel kept

    def _committed_docs(ix):
        runs = sorted(os.listdir(ix + "/commits"))
        paths = [ix + f"/band_keys/run_id={r}" for r in runs]
        return {
            r.doc_id
            for r in spark.read.parquet(*paths).select("doc_id")
            .distinct().collect()
        }

    assert _committed_docs(idx) == _committed_docs(idx_twin) == {
        0, 1, 2, 3, 200, 201,
    }


# --------------------------------------------- standing EMBEDDING index
def _emb_index_fixture(spark, tmp_path, tag, docs_words, vecs):
    schema = "doc_id long, text string, lang string, source string"
    p_docs = str(tmp_path / f"docs_{tag}.parquet")
    spark.createDataFrame(
        [(i, " ".join(w), "en", "web") for i, w in docs_words], schema
    ).write.parquet(p_docs)
    p_emb = str(tmp_path / f"emb_{tag}.parquet")
    spark.createDataFrame(
        vecs, "doc_id long, embedding array<double>"
    ).write.parquet(p_emb)
    return p_docs, p_emb


_W1 = [
    (0, ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]),
    (1, ["golf", "hotel", "india", "juliet", "kilo", "lima"]),
    (2, ["mike", "november", "oscar", "papa", "quebec", "romeo"]),
]
_W2 = [
    (10, ["sierra", "tango", "uniform", "victor", "whiskey", "xray"]),
    (11, ["yankee", "zulu", "apple", "banana", "cherry", "date"]),
    (12, ["elder", "fig", "grape", "honey", "iris", "jade"]),
]
_V1 = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])]
# run 2: 10 duplicates run-1's doc 0 vector, 11 duplicates doc 12
# (within-batch, larger id loses), 12 is novel
_V2 = [(10, [1.0, 0.0, 0.0]), (11, [0.5, 0.5, 0.0]), (12, [0.5, 0.5, 0.0])]


def test_curate_embedding_index_ingest_loop(spark, tmp_path):  # noqa: F811
    """The standing EMBEDDING index — the vector twin of --corpus-index:
    run 2's vectors are matched against run 1's persisted survivors
    (doc 10 rejected as a dup of doc 0) plus smaller-id batch docs
    (12 rejected against 11, keep-first), and only survivors' vectors
    are appended."""
    import json
    import os

    from yelp_recommender_spark.curate import curate_corpus

    d1, e1 = _emb_index_fixture(spark, tmp_path, "r1", _W1, _V1)
    d2, e2 = _emb_index_fixture(spark, tmp_path, "r2", _W2, _V2)
    idx = str(tmp_path / "emb_idx")
    r1 = curate_corpus(
        spark, d1, str(tmp_path / "o1"),
        embeddings_path=e1, embedding_threshold=0.95,
        embedding_index_dir=idx,
    )
    assert r1["n_embedding_dup_rejected"] == 0
    assert r1["embedding_dedup"]["mode"] == "incremental"
    meta = json.load(open(idx + "/meta.json"))
    assert meta["kind"] == "embedding_index" and meta["dim"] == 3
    # the SRP plane family is pinned at first ingest (bucket keys are
    # family-specific — the band-key index's _INDEX_PARAMS convention)
    assert meta["threshold"] == 0.95
    assert meta["n_planes"] >= 1 and meta["n_tables"] >= 1
    assert os.path.isdir(idx + "/buckets")
    n_idx = (
        spark.read.parquet(idx + "/vectors").select("doc_id").distinct()
    ).count()
    assert n_idx == 3

    r2 = curate_corpus(
        spark, d2, str(tmp_path / "o2"),
        embeddings_path=e2, embedding_threshold=0.95,
        embedding_index_dir=idx,
    )
    assert r2["n_embedding_dup_rejected"] == 2  # 10 (vs corpus), 12 (vs 11)
    kept = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "o2/documents")).collect()
    }
    assert kept == {11}
    # index grew by exactly the surviving vector
    ids_after = {
        r.doc_id
        for r in spark.read.parquet(idx + "/vectors").select("doc_id")
        .distinct().collect()
    }
    assert ids_after == {0, 1, 2, 11}


def test_curate_embedding_index_guards(spark, tmp_path):  # noqa: F811
    """Dim mismatch, data-without-commit-log, and the flag-dependency
    precondition all raise instead of silently mis-scoring."""
    import os
    import shutil

    import pytest

    from yelp_recommender_spark.curate import curate_corpus

    d1, e1 = _emb_index_fixture(spark, tmp_path, "g1", _W1, _V1)
    idx = str(tmp_path / "gidx")
    with pytest.raises(ValueError, match="requires embeddings_path"):
        curate_corpus(
            spark, d1, str(tmp_path / "g0"), embedding_index_dir=idx
        )
    curate_corpus(
        spark, d1, str(tmp_path / "g1o"),
        embeddings_path=e1, embedding_index_dir=idx,
    )
    # 4-dim batch against the 3-dim index → reject
    d4, e4 = _emb_index_fixture(
        spark, tmp_path, "g4", _W2,
        [(10, [1.0, 0.0, 0.0, 0.0])],
    )
    with pytest.raises(ValueError, match="3-dim vectors"):
        curate_corpus(
            spark, d4, str(tmp_path / "g4o"),
            embeddings_path=e4, embedding_index_dir=idx,
        )
    # a run threshold BELOW the family's derivation threshold falls
    # under the index's recall target → reject
    with pytest.raises(ValueError, match="was keyed for"):
        curate_corpus(
            spark, d1, str(tmp_path / "g5t"),
            embeddings_path=e1, embedding_index_dir=idx,
            embedding_threshold=0.5,
        )
    # committed runs without a family record = unknown provenance (a
    # re-derived family could silently miss every candidate)
    os.remove(idx + "/meta.json")
    with pytest.raises(ValueError, match="no meta.json"):
        curate_corpus(
            spark, d1, str(tmp_path / "g5m"),
            embeddings_path=e1, embedding_index_dir=idx,
        )
    import json

    with open(idx + "/meta.json", "w") as f:
        json.dump(
            {"kind": "embedding_index", "dim": 3, "threshold": 0.95,
             "n_planes": 8, "n_tables": 4, "seed": 42}, f,
        )
    # vector data without a commit log = unknown provenance
    shutil.rmtree(idx + "/commits")
    with pytest.raises(ValueError, match="no commit log"):
        curate_corpus(
            spark, d1, str(tmp_path / "g5o"),
            embeddings_path=e1, embedding_index_dir=idx,
        )


def test_curate_embedding_index_crash_replay(spark, tmp_path, monkeypatch):  # noqa: F811
    """Same crash discipline as the band-key index, gated on the real
    path: a run killed between the vector append and its commit marker
    leaves a stray run the re-run ignores; the replayed state equals a
    never-crashed twin's."""
    import builtins
    import os

    import pytest

    from yelp_recommender_spark.curate import curate_corpus

    d1, e1 = _emb_index_fixture(spark, tmp_path, "c1", _W1, _V1)
    d2, e2 = _emb_index_fixture(spark, tmp_path, "c2", _W2, _V2)
    idx, twin = str(tmp_path / "cidx"), str(tmp_path / "cidx_twin")
    for ix, o in ((idx, "co1"), (twin, "ct1")):
        curate_corpus(
            spark, d1, str(tmp_path / o),
            embeddings_path=e1, embedding_index_dir=ix,
        )

    real_open = builtins.open

    def crash_on_marker(path, *a, **k):
        if (
            isinstance(path, (str, os.PathLike))
            and os.sep + "commits" + os.sep in str(path)
            and a[:1] == ("w",)
        ):
            raise RuntimeError("simulated crash before commit marker")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", crash_on_marker)
    with pytest.raises(RuntimeError, match="simulated crash"):
        curate_corpus(
            spark, d2, str(tmp_path / "co2_crashed"),
            embeddings_path=e2, embedding_index_dir=idx,
        )
    monkeypatch.setattr(builtins, "open", real_open)

    committed = {f"run_id={r}" for r in os.listdir(idx + "/commits")}
    on_disk = set(os.listdir(idx + "/vectors"))
    assert committed < on_disk  # the stray crashed run exists

    r_replay = curate_corpus(
        spark, d2, str(tmp_path / "co2"),
        embeddings_path=e2, embedding_index_dir=idx,
    )
    r_twin = curate_corpus(
        spark, d2, str(tmp_path / "ct2"),
        embeddings_path=e2, embedding_index_dir=twin,
    )
    assert (
        r_replay["n_embedding_dup_rejected"]
        == r_twin["n_embedding_dup_rejected"]
        == 2
    )

    def _ids(ix):
        runs = sorted(os.listdir(ix + "/commits"))
        paths = [ix + f"/vectors/run_id={r}" for r in runs]
        return {
            r.doc_id
            for r in spark.read.parquet(*paths).select("doc_id")
            .distinct().collect()
        }

    assert _ids(idx) == _ids(twin) == {0, 1, 2, 11}


def test_curate_embedding_index_lsh_tier_uses_persisted_buckets(
    spark, tmp_path, monkeypatch
):  # noqa: F811
    """Past the broadcast limit the incremental stage must probe the
    PERSISTED bucket keys — batch-keys × index-keys, never a re-bucket
    of the accumulated corpus — and reject identically to the exact
    tier. srp_bucket_assignments is spied to prove the only bucketing
    call is over the batch."""
    from yelp_recommender_spark import curate as C
    from yelp_recommender_spark.curate import curate_corpus
    from yelp_recommender_spark.operators import ann

    d1, e1 = _emb_index_fixture(spark, tmp_path, "l1", _W1, _V1)
    d2, e2 = _emb_index_fixture(spark, tmp_path, "l2", _W2, _V2)
    idx = str(tmp_path / "lidx")
    # run 1 on the exact tier (default limit) seeds vectors + buckets
    curate_corpus(
        spark, d1, str(tmp_path / "lo1"),
        embeddings_path=e1, embedding_index_dir=idx,
    )
    # run 2 forced onto the LSH tier: every bucketing call is recorded
    calls = []
    real = ann.srp_bucket_assignments

    def spy(df, id_col, vec_col, **kw):
        calls.append(df.count())
        return real(df, id_col, vec_col, **kw)

    monkeypatch.setattr(ann, "srp_bucket_assignments", spy)
    r2 = curate_corpus(
        spark, d2, str(tmp_path / "lo2"),
        embeddings_path=e2, embedding_index_dir=idx,
        embedding_broadcast_limit=1,
    )
    # identical verdicts to the exact tier (tight planted dups)
    assert r2["n_embedding_dup_rejected"] == 2
    kept = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "lo2/documents")).collect()
    }
    assert kept == {11}
    # ONE bucketing pass, over the 3-row batch — the 3-doc corpus was
    # probed via its persisted keys, not re-bucketed
    assert calls == [3]


def test_curate_combined_indexes_crash_leaves_both_uncommitted(
    spark, tmp_path, monkeypatch
):  # noqa: F811
    """With BOTH standing indexes configured, all data is staged before
    ANY commit marker drops: a crash at the first marker write leaves
    both indexes uncommitted, so the batch replay is clean on both and
    matches a never-crashed twin — no cross-index divergence from a
    crash anywhere in the data phase."""
    import builtins
    import os

    import pytest

    from yelp_recommender_spark.curate import curate_corpus

    d1, e1 = _emb_index_fixture(spark, tmp_path, "b1", _W1, _V1)
    d2, e2 = _emb_index_fixture(spark, tmp_path, "b2", _W2, _V2)
    mh, mh_t = str(tmp_path / "mh"), str(tmp_path / "mh_t")
    em, em_t = str(tmp_path / "em"), str(tmp_path / "em_t")
    for mhd, emd, o in ((mh, em, "bo1"), (mh_t, em_t, "bt1")):
        curate_corpus(
            spark, d1, str(tmp_path / o),
            corpus_index_dir=mhd,
            embeddings_path=e1, embedding_index_dir=emd,
        )
    assert _committed_run_ids(mh) and _committed_run_ids(em)

    real_open = builtins.open

    def crash_on_marker(path, *a, **k):
        if (
            isinstance(path, (str, os.PathLike))
            and os.sep + "commits" + os.sep in str(path)
            and a[:1] == ("w",)
        ):
            raise RuntimeError("simulated crash at first marker")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", crash_on_marker)
    with pytest.raises(RuntimeError, match="simulated crash"):
        curate_corpus(
            spark, d2, str(tmp_path / "bo2_crashed"),
            corpus_index_dir=mh,
            embeddings_path=e2, embedding_index_dir=em,
        )
    monkeypatch.setattr(builtins, "open", real_open)

    # BOTH indexes hold stray (uncommitted) run-2 data: the crash hit
    # before any commit-phase write, because staging completed first
    for ix, data in ((mh, "band_keys"), (em, "vectors")):
        committed = {f"run_id={r}" for r in _committed_run_ids(ix)}
        assert committed < set(os.listdir(f"{ix}/{data}"))

    # replay matches the never-crashed twin on both indexes
    r = curate_corpus(
        spark, d2, str(tmp_path / "bo2"),
        corpus_index_dir=mh,
        embeddings_path=e2, embedding_index_dir=em,
    )
    rt = curate_corpus(
        spark, d2, str(tmp_path / "bt2"),
        corpus_index_dir=mh_t,
        embeddings_path=e2, embedding_index_dir=em_t,
    )
    for key in ("n_curated", "n_near_dup_rejected",
                "n_embedding_dup_rejected"):
        assert r[key] == rt[key], key

    assert _committed_doc_ids(spark, mh, "band_keys") == _committed_doc_ids(
        spark, mh_t, "band_keys"
    )
    assert _committed_doc_ids(spark, em, "vectors") == _committed_doc_ids(
        spark, em_t, "vectors"
    )


def _committed_run_ids(index_dir):
    """Effective committed run ids through the engine's own commit-log
    resolver (bare markers, txn pointers, compaction records)."""
    from yelp_recommender_spark.curate import _resolve_commit_log

    runs, _ = _resolve_commit_log(index_dir + "/commits")
    return runs


def _committed_doc_ids(spark, index_dir, component):
    paths = [
        f"{index_dir}/{component}/run_id={r}"
        for r in _committed_run_ids(index_dir)
    ]
    return {
        row.doc_id
        for row in spark.read.parquet(*paths).select("doc_id")
        .distinct().collect()
    }


def test_curate_combined_commit_point_is_atomic(
    spark, tmp_path, monkeypatch
):  # noqa: F811
    """VERDICT r7 #1 — the r7 marker-to-marker window is CLOSED: with
    both standing indexes staged, the commit is a single atomic rename.
    Killing the run (a) after the first intent pointer (the exact point
    that used to commit one index and not the other) and (b) at the
    rename itself both leave BOTH indexes uncommitted, and the replay
    equals a never-crashed twin. There is no instant at which one index
    is committed and the other is not."""
    import builtins
    import os

    import pytest

    from yelp_recommender_spark.curate import curate_corpus

    d1, e1 = _emb_index_fixture(spark, tmp_path, "a1", _W1, _V1)
    d2, e2 = _emb_index_fixture(spark, tmp_path, "a2", _W2, _V2)
    mh, mh_t = str(tmp_path / "amh"), str(tmp_path / "amh_t")
    em, em_t = str(tmp_path / "aem"), str(tmp_path / "aem_t")
    for mhd, emd, o in ((mh, em, "ao1"), (mh_t, em_t, "at1")):
        curate_corpus(
            spark, d1, str(tmp_path / o),
            corpus_index_dir=mhd,
            embeddings_path=e1, embedding_index_dir=emd,
        )

    # ---- crash (a): AFTER the first intent pointer lands — the old
    # between-the-two-markers instant. The pointer is durable but its
    # txn record never publishes, so it is a dangling intent: NEITHER
    # index commits.
    real_open = builtins.open
    state = {"commit_writes": 0}

    def crash_on_second_commit_write(path, *a, **k):
        if (
            isinstance(path, (str, os.PathLike))
            and os.sep + "commits" + os.sep in str(path)
            and a[:1] == ("w",)
        ):
            state["commit_writes"] += 1
            if state["commit_writes"] == 2:
                raise RuntimeError("simulated crash between intents")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", crash_on_second_commit_write)
    with pytest.raises(RuntimeError, match="between intents"):
        curate_corpus(
            spark, d2, str(tmp_path / "ao2_c1"),
            corpus_index_dir=mh,
            embeddings_path=e2, embedding_index_dir=em,
        )
    monkeypatch.setattr(builtins, "open", real_open)
    assert len(_committed_run_ids(mh)) == 1  # still only run 1
    assert len(_committed_run_ids(em)) == 1
    # the first index DOES hold a dangling intent — the crash hit the
    # exact former window, and it no longer commits anything
    committed_now = set(_committed_run_ids(mh))
    assert any(
        e.endswith(".txn") and e[: -len(".txn")] not in committed_now
        for e in os.listdir(mh + "/commits")
    )

    # ---- crash (b): at the txn-record rename (the commit point itself)
    real_replace = os.replace

    def crash_on_txn_publish(src, dst, *a, **k):
        if "txn-" in os.path.basename(str(dst)):
            raise RuntimeError("simulated crash at commit point")
        return real_replace(src, dst, *a, **k)

    monkeypatch.setattr(os, "replace", crash_on_txn_publish)
    with pytest.raises(RuntimeError, match="at commit point"):
        curate_corpus(
            spark, d2, str(tmp_path / "ao2_c2"),
            corpus_index_dir=mh,
            embeddings_path=e2, embedding_index_dir=em,
        )
    monkeypatch.setattr(os, "replace", real_replace)
    assert len(_committed_run_ids(mh)) == 1
    assert len(_committed_run_ids(em)) == 1

    # ---- replay equals the never-crashed twin on both indexes --------
    r = curate_corpus(
        spark, d2, str(tmp_path / "ao2"),
        corpus_index_dir=mh,
        embeddings_path=e2, embedding_index_dir=em,
    )
    rt = curate_corpus(
        spark, d2, str(tmp_path / "at2"),
        corpus_index_dir=mh_t,
        embeddings_path=e2, embedding_index_dir=em_t,
    )
    for key in ("n_curated", "n_near_dup_rejected",
                "n_embedding_dup_rejected"):
        assert r[key] == rt[key], key
    assert _committed_doc_ids(spark, mh, "band_keys") == _committed_doc_ids(
        spark, mh_t, "band_keys"
    )
    assert _committed_doc_ids(spark, em, "vectors") == _committed_doc_ids(
        spark, em_t, "vectors"
    )
    # and both sides of the multi-index commit are now committed runs
    assert len(_committed_run_ids(mh)) == 2
    assert len(_committed_run_ids(em)) == 2


# ------------------------------------------------------- ADVICE r7 closures
def test_curate_null_embedding_rows_pass_unchecked(spark, tmp_path):  # noqa: F811
    """ADVICE r7 #1: a NULL embedding value is 'no vector' — the doc
    passes the stage unchecked (same as a doc absent from the parquet),
    the dim probe derives from a non-null row, and the kernels never
    see a None vector. Applies to both the standing-index mode and the
    bounded within-batch mode."""
    from yelp_recommender_spark.curate import curate_corpus

    # doc 0's embedding is NULL; 1 and 2 duplicate each other
    words = _W1 + [(3, ["kale", "lemon", "mango", "nectar", "olive",
                        "peach"])]
    docs = str(tmp_path / "nd.parquet")
    spark.createDataFrame(
        [(i, " ".join(w), "en", "web") for i, w in words],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(docs)
    emb = str(tmp_path / "ne.parquet")
    spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0])],
        "doc_id long, embedding array<double>",
    ).write.parquet(emb)

    idx = str(tmp_path / "nidx")
    r = curate_corpus(
        spark, docs, str(tmp_path / "no1"),
        embeddings_path=emb, embedding_threshold=0.95,
        embedding_index_dir=idx,
    )
    assert r["n_embedding_dup_rejected"] == 1  # 2 dups 1; 0 unchecked
    kept = {
        x.doc_id
        for x in spark.read.parquet(str(tmp_path / "no1/documents"))
        .collect()
    }
    assert kept == {0, 1, 3}
    # the null-vector doc was never appended to the index
    import os

    ids_idx = {
        x.doc_id
        for x in spark.read.parquet(idx + "/vectors").select("doc_id")
        .collect()
    }
    assert ids_idx == {1}
    assert os.path.exists(idx + "/meta.json")  # dim derived from doc 1

    # bounded within-batch mode: same survivors, no crash on the null
    r2 = curate_corpus(
        spark, docs, str(tmp_path / "no2"),
        embeddings_path=emb, embedding_threshold=0.95,
        max_pairs_per_doc=5,
    )
    assert r2["n_embedding_dup_rejected"] == 1


def test_curate_all_null_embeddings_is_a_clean_noop_stage(
    spark, tmp_path
):  # noqa: F811
    """Every vector NULL → the stage checks nothing, rejects nothing,
    appends nothing, and pins no meta (no dim to derive)."""
    import os

    from yelp_recommender_spark.curate import curate_corpus

    docs = str(tmp_path / "an.parquet")
    spark.createDataFrame(
        [(i, " ".join(w), "en", "web") for i, w in _W1],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(docs)
    emb = str(tmp_path / "ae.parquet")
    spark.createDataFrame(
        [(0, None), (1, None)], "doc_id long, embedding array<double>"
    ).write.parquet(emb)
    idx = str(tmp_path / "aidx")
    r = curate_corpus(
        spark, docs, str(tmp_path / "ao"),
        embeddings_path=emb, embedding_threshold=0.95,
        embedding_index_dir=idx,
    )
    assert r["n_embedding_dup_rejected"] == 0
    assert r["n_curated"] == 3
    assert not os.path.exists(idx + "/meta.json")
    assert not os.path.exists(idx + "/vectors")


def test_curate_cli_rejects_negative_max_pairs(spark, tmp_path):  # noqa: F811
    """ADVICE r7 #2: --max-pairs-per-doc < 0 is a parser error, not a
    silent switch into the unbounded exact contract (0 stays the
    documented opt-out)."""
    import pytest

    from yelp_recommender_spark import cli

    with pytest.raises(SystemExit):
        cli.main([
            "curate", "--input", "x", "--output", "y",
            "--max-pairs-per-doc", "-1",
        ])


def test_curate_string_keyed_embedding_index_first_ingest(
    spark, tmp_path
):  # noqa: F811
    """ADVICE r7 #3: a string-keyed embeddings parquet must work on the
    FIRST ingest too — the empty-index placeholders carry the batch's
    actual id type instead of a hardcoded long."""
    from yelp_recommender_spark.curate import curate_corpus

    words = [("a0", _W1[0][1]), ("a1", _W1[1][1]), ("a2", _W1[2][1])]
    docs = str(tmp_path / "sk.parquet")
    spark.createDataFrame(
        [(i, " ".join(w), "en", "web") for i, w in words],
        "doc_id string, text string, lang string, source string",
    ).write.parquet(docs)
    emb = str(tmp_path / "se.parquet")
    spark.createDataFrame(
        [("a0", [1.0, 0.0, 0.0]), ("a1", [0.0, 1.0, 0.0]),
         ("a2", [1.0, 0.0, 0.0])],
        "doc_id string, embedding array<double>",
    ).write.parquet(emb)
    idx = str(tmp_path / "sidx")
    r = curate_corpus(
        spark, docs, str(tmp_path / "so"),
        embeddings_path=emb, embedding_threshold=0.95,
        embedding_index_dir=idx,
    )
    # keep-first on string order: a2 duplicates a0 and is rejected
    assert r["n_embedding_dup_rejected"] == 1
    ids_idx = {
        x.doc_id
        for x in spark.read.parquet(idx + "/vectors").select("doc_id")
        .collect()
    }
    assert ids_idx == {"a0", "a1"}


def test_crashed_first_ingest_meta_is_stale_not_binding(
    spark, tmp_path, monkeypatch
):  # noqa: F811
    """ADVICE r7 #4: meta.json now lands at commit time, and a meta with
    NO committed runs (the stale stamp a pre-r8 crashed ingest leaves)
    is re-derived past instead of rejecting the run — a later ingest at
    a LOWER threshold succeeds and refreshes the stamp."""
    import json
    import os

    import pytest

    from yelp_recommender_spark.curate import curate_corpus

    d1, e1 = _emb_index_fixture(spark, tmp_path, "sm1", _W1, _V1)
    idx = str(tmp_path / "smidx")

    # simulate the pre-r8 crash shape: stale meta pinned at a HIGH
    # threshold, empty commit log, stray run data
    os.makedirs(idx + "/commits")
    with open(idx + "/meta.json", "w") as f:
        json.dump(
            {"kind": "embedding_index", "dim": 3, "threshold": 0.99,
             "n_planes": 12, "n_tables": 6, "seed": 42}, f,
        )
    spark.createDataFrame(
        [(999, [1.0, 0.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(idx + "/vectors/run_id=stray")

    # a run at threshold 0.9 — BELOW the stale stamp — must succeed
    # (nothing committed is keyed under that family)
    r = curate_corpus(
        spark, d1, str(tmp_path / "smo"),
        embeddings_path=e1, embedding_threshold=0.9,
        embedding_index_dir=idx,
    )
    assert r["n_curated"] == 3
    meta = json.load(open(idx + "/meta.json"))
    assert meta["threshold"] == 0.9  # refreshed at commit time
    # and with a committed run, the family IS binding again
    with pytest.raises(ValueError, match="was keyed for"):
        curate_corpus(
            spark, d1, str(tmp_path / "smo2"),
            embeddings_path=e1, embedding_threshold=0.5,
            embedding_index_dir=idx,
        )
