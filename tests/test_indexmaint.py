"""Standing-index maintenance (VERDICT r7 asks #2 and #8): compaction
rewrites N committed ingest runs into one baseline run without changing
any dedup answer, under the same data-then-commit crash discipline as
the ingest loop; the doctor audits an index read-only and the CLI exits
nonzero on real damage."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def _write_docs(spark, tmp_path, tag, rows):  # noqa: F811
    p = str(tmp_path / f"docs_{tag}.parquet")
    spark.createDataFrame(
        [(i, " ".join(w), "en", "web") for i, w in rows],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(p)
    return p


def _write_emb(spark, tmp_path, tag, vecs):  # noqa: F811
    p = str(tmp_path / f"emb_{tag}.parquet")
    spark.createDataFrame(
        vecs, "doc_id long, embedding array<double>"
    ).write.parquet(p)
    return p


_RUNS = [
    [(0, ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]),
     (1, ["golf", "hotel", "india", "juliet", "kilo", "lima"])],
    [(10, ["mike", "november", "oscar", "papa", "quebec", "romeo"]),
     (11, ["sierra", "tango", "uniform", "victor", "whiskey", "xray"])],
    [(20, ["yankee", "zulu", "apple", "banana", "cherry", "date"]),
     (21, ["elder", "fig", "grape", "honey", "iris", "jade"])],
]
# one orthogonal unit vector per doc — every doc is novel
_VECS = {
    k: [1.0 if i == j else 0.0 for j in range(6)]
    for i, k in enumerate([0, 1, 10, 11, 20, 21])
}


def _ingest_n_runs(spark, tmp_path, idx, n, prefix, embedding=False):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus

    for i in range(n):
        docs = _write_docs(spark, tmp_path, f"{prefix}{i}", _RUNS[i])
        kw = {}
        if embedding:
            kw = {
                "embeddings_path": _write_emb(
                    spark, tmp_path, f"{prefix}{i}",
                    [(d, _VECS[d]) for d, _ in _RUNS[i]],
                ),
                "embedding_index_dir": idx,
            }
        else:
            kw = {"corpus_index_dir": idx}
        curate_corpus(
            spark, docs, str(tmp_path / f"{prefix}out{i}"), **kw
        )


def _run_dirs(idx, component):
    return sorted(
        e for e in os.listdir(f"{idx}/{component}")
        if e.startswith("run_id=")
    )


# ------------------------------------------------------------- compaction
def test_compact_minhash_index_loads_identically(spark, tmp_path):  # noqa: F811
    """Compaction must be invisible to the dedup contract: a follow-on
    batch (one dup of each prior run + one novel doc) rejects/keeps the
    same docs against the compacted index as against an uncompacted
    twin, and the run-dir count drops to 1."""
    from yelp_recommender_spark.curate import curate_corpus
    from yelp_recommender_spark.indexmaint import compact_standing_index

    idx, twin = str(tmp_path / "mh"), str(tmp_path / "mh_t")
    _ingest_n_runs(spark, tmp_path, idx, 3, "a")
    _ingest_n_runs(spark, tmp_path, twin, 3, "b")
    assert len(_run_dirs(idx, "band_keys")) == 3

    report = compact_standing_index(spark, idx)
    assert report["compacted"] and report["kind"] == "minhash"
    assert report["committed_runs"] == 3
    assert _run_dirs(idx, "band_keys") == [
        f"run_id={report['baseline_run']}"
    ]
    assert _run_dirs(idx, "shingles") == [
        f"run_id={report['baseline_run']}"
    ]

    # follow-on batch: docs 0 and 20 are dups of runs 1 and 3; 99 novel
    follow = [
        (100, _RUNS[0][0][1]), (101, _RUNS[2][0][1]),
        (99, ["quince", "rose", "sage", "thyme", "umber", "vine"]),
    ]
    outs = {}
    for ix, tag in ((idx, "f_idx"), (twin, "f_twin")):
        docs = _write_docs(spark, tmp_path, tag, follow)
        outs[tag] = curate_corpus(
            spark, docs, str(tmp_path / f"{tag}_out"),
            corpus_index_dir=ix,
        )
    assert (
        outs["f_idx"]["n_near_dup_rejected"]
        == outs["f_twin"]["n_near_dup_rejected"]
        == 2
    )
    assert outs["f_idx"]["n_curated"] == outs["f_twin"]["n_curated"] == 1


def test_compact_embedding_index_loads_identically(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.curate import curate_corpus
    from yelp_recommender_spark.indexmaint import compact_standing_index

    idx = str(tmp_path / "em")
    _ingest_n_runs(spark, tmp_path, idx, 3, "e", embedding=True)
    assert len(_run_dirs(idx, "vectors")) == 3
    meta_before = json.load(open(idx + "/meta.json"))

    report = compact_standing_index(spark, idx)
    assert report["compacted"] and report["kind"] == "embedding"
    assert len(_run_dirs(idx, "vectors")) == 1
    assert len(_run_dirs(idx, "buckets")) == 1
    # the plane family is data, not a run: compaction must not touch it
    assert json.load(open(idx + "/meta.json")) == meta_before

    # follow-on: 100 duplicates doc 0's vector, 102 is novel
    docs = _write_docs(
        spark, tmp_path, "ef",
        [(100, ["kale", "lemon", "mango", "nectar", "olive", "peach"]),
         (102, ["nova", "orbit", "pulse", "quark", "raven", "sol"])],
    )
    emb = _write_emb(
        spark, tmp_path, "ef",
        [(100, _VECS[0]), (102, [0.5, 0.5, 0.5, 0.0, 0.0, 0.0])],
    )
    r = curate_corpus(
        spark, docs, str(tmp_path / "ef_out"),
        embeddings_path=emb, embedding_index_dir=idx,
    )
    assert r["n_embedding_dup_rejected"] == 1
    kept = {
        x.doc_id
        for x in spark.read.parquet(str(tmp_path / "ef_out/documents"))
        .collect()
    }
    assert kept == {102}


def test_compact_is_a_noop_below_two_runs(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.indexmaint import compact_standing_index

    idx = str(tmp_path / "one")
    _ingest_n_runs(spark, tmp_path, idx, 1, "n")
    report = compact_standing_index(spark, idx)
    assert not report["compacted"]
    assert report["committed_runs"] == 1
    assert len(_run_dirs(idx, "band_keys")) == 1


def test_compact_chained_twice(spark, tmp_path):  # noqa: F811
    """A second compaction replaces the first baseline plus newer runs —
    the sequence-ordered records must resolve to exactly one effective
    run, with the same committed doc set throughout."""
    from yelp_recommender_spark.curate import _resolve_commit_log
    from yelp_recommender_spark.indexmaint import compact_standing_index

    idx = str(tmp_path / "chain")
    _ingest_n_runs(spark, tmp_path, idx, 2, "c")
    compact_standing_index(spark, idx)
    docs = _write_docs(spark, tmp_path, "c2", _RUNS[2])
    from yelp_recommender_spark.curate import curate_corpus

    curate_corpus(
        spark, docs, str(tmp_path / "c2out"), corpus_index_dir=idx
    )
    report = compact_standing_index(spark, idx)
    assert report["compacted"] and report["committed_runs"] == 2
    runs, _ = _resolve_commit_log(idx + "/commits")
    assert runs == [report["baseline_run"]]
    docs_in = {
        r.doc_id
        for r in spark.read.parquet(
            f"{idx}/band_keys/run_id={report['baseline_run']}"
        ).select("doc_id").distinct().collect()
    }
    assert docs_in == {0, 1, 10, 11, 20, 21}


def test_compact_crash_before_commit_leaves_old_runs(
    spark, tmp_path, monkeypatch
):  # noqa: F811
    """A crash at the compaction record's publish rename leaves the old
    runs fully intact and committed — the staged baseline is an
    uncommitted stray the loaders skip — and re-running the compaction
    afterwards succeeds."""
    from yelp_recommender_spark.curate import _resolve_commit_log
    from yelp_recommender_spark.indexmaint import compact_standing_index

    idx = str(tmp_path / "crash")
    _ingest_n_runs(spark, tmp_path, idx, 2, "x")
    runs_before, _ = _resolve_commit_log(idx + "/commits")

    real_replace = os.replace

    def crash_on_publish(src, dst, *a, **k):
        if "compact-" in os.path.basename(str(dst)):
            raise RuntimeError("simulated crash at compaction publish")
        return real_replace(src, dst, *a, **k)

    monkeypatch.setattr(os, "replace", crash_on_publish)
    with pytest.raises(RuntimeError, match="compaction publish"):
        compact_standing_index(spark, idx)
    monkeypatch.setattr(os, "replace", real_replace)

    runs_after, _ = _resolve_commit_log(idx + "/commits")
    assert runs_after == runs_before  # old runs still the committed view
    # staged baseline survives as a stray (harmless, pending GC/retry)
    assert len(_run_dirs(idx, "band_keys")) == 3

    report = compact_standing_index(spark, idx)
    assert report["compacted"]
    runs_final, _ = _resolve_commit_log(idx + "/commits")
    assert runs_final == [report["baseline_run"]]


# ----------------------------------------------------------------- doctor
def test_check_index_healthy_and_damaged(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.indexmaint import check_index

    idx = str(tmp_path / "doc_mh")
    _ingest_n_runs(spark, tmp_path, idx, 2, "d")
    rep = check_index(idx)
    assert rep["ok"] and rep["kind"] == "minhash"
    assert rep["committed_runs"] == 2 and rep["stray_runs"] == 0

    # stray uncommitted data → warning, still ok
    spark.createDataFrame(
        [(999, "deadbeef")], "doc_id long, bk string"
    ).write.parquet(idx + "/band_keys/run_id=stray1")
    rep = check_index(idx)
    assert rep["ok"] and rep["stray_runs"] == 1
    assert any("stray" in w for w in rep["warnings"])

    # torn: committed run data removed → error
    runs = [
        e for e in os.listdir(idx + "/band_keys")
        if e != "run_id=stray1"
    ]
    shutil.rmtree(f"{idx}/band_keys/{runs[0]}")
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("torn" in e for e in rep["errors"])


def test_check_index_meta_family(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.indexmaint import check_index

    idx = str(tmp_path / "doc_fam")
    _ingest_n_runs(spark, tmp_path, idx, 1, "m")
    # family mismatch → error
    with open(idx + "/meta.json", "w") as f:
        json.dump({"n_hashes": 16, "bands": 8, "fast": False}, f)
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("mismatch" in e for e in rep["errors"])
    # meta gone with committed runs → error
    os.remove(idx + "/meta.json")
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("no meta.json" in e for e in rep["errors"])


def test_check_index_embedding_and_not_an_index(spark, tmp_path):  # noqa: F811
    from yelp_recommender_spark.indexmaint import check_index

    idx = str(tmp_path / "doc_em")
    _ingest_n_runs(spark, tmp_path, idx, 1, "em", embedding=True)
    rep = check_index(idx)
    assert rep["ok"] and rep["kind"] == "embedding"

    # meta torn down to a partial record → error names the fields
    with open(idx + "/meta.json", "w") as f:
        json.dump({"kind": "embedding_index", "dim": 6}, f)
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("missing plane-family fields" in e for e in rep["errors"])

    # not an index at all
    rep = check_index(str(tmp_path / "nope"))
    assert not rep["ok"]
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    rep = check_index(empty)
    assert not rep["ok"]


def test_maintain_cli_index_modes(spark, tmp_path, capsys):  # noqa: F811
    """CLI surface: --check-index prints a report and exits 2 on damage;
    --index compacts; exactly one mode must be chosen."""
    from yelp_recommender_spark import cli

    idx = str(tmp_path / "cli_mh")
    _ingest_n_runs(spark, tmp_path, idx, 2, "q")

    cli.main(["maintain", "--check-index", idx])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"] and rep["committed_runs"] == 2

    cli.main(["maintain", "--index", idx])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["compacted"]
    assert len(_run_dirs(idx, "band_keys")) == 1

    # doctor exit code on damage (torn committed run)
    runs = _run_dirs(idx, "band_keys")
    shutil.rmtree(f"{idx}/band_keys/{runs[0]}")
    with pytest.raises(SystemExit) as ei:
        cli.main(["maintain", "--check-index", idx])
    assert ei.value.code == 2

    # mode exclusivity is a parse error
    with pytest.raises(SystemExit):
        cli.main(["maintain", "--check-index", idx, "--index", idx])
    with pytest.raises(SystemExit):
        cli.main(["maintain"])


def test_compact_txn_committed_runs_cross_index(spark, tmp_path):  # noqa: F811
    """Compaction × the atomic multi-index commit: runs committed via
    intent pointers + a hosted transaction record (curate with BOTH
    indexes) must compact exactly like bare-marker runs — and compacting
    ONE index must not disturb the other, whose pointers reference
    transaction records HOSTED in the compacted index's commit log
    (hosted records are never GC'd by run replacement)."""
    from yelp_recommender_spark.curate import (
        _resolve_commit_log,
        curate_corpus,
    )
    from yelp_recommender_spark.indexmaint import (
        check_index,
        compact_standing_index,
    )

    mh, em = str(tmp_path / "xmh"), str(tmp_path / "xem")
    for i in range(2):
        docs = _write_docs(spark, tmp_path, f"x{i}", _RUNS[i])
        emb = _write_emb(
            spark, tmp_path, f"x{i}",
            [(d, _VECS[d]) for d, _ in _RUNS[i]],
        )
        curate_corpus(
            spark, docs, str(tmp_path / f"xo{i}"),
            corpus_index_dir=mh,
            embeddings_path=emb, embedding_index_dir=em,
        )
    for ix in (mh, em):
        runs, _ = _resolve_commit_log(ix + "/commits")
        assert len(runs) == 2

    # compact the HOST index (minhash hosts the txn records)
    rep = compact_standing_index(spark, mh)
    assert rep["compacted"] and rep["committed_runs"] == 2
    # the embedding index's txn-pointer commits still resolve: their
    # hosted records in mh/commits survived the GC
    em_runs, _ = _resolve_commit_log(em + "/commits")
    assert len(em_runs) == 2
    assert check_index(em)["ok"] and check_index(mh)["ok"]

    # compact the embedding index too, then a follow-on combined ingest
    # must reject/keep identically to a never-compacted twin
    rep = compact_standing_index(spark, em)
    assert rep["compacted"]
    mh_t, em_t = str(tmp_path / "xmh_t"), str(tmp_path / "xem_t")
    for i in range(2):
        docs = _write_docs(spark, tmp_path, f"xt{i}", _RUNS[i])
        emb = _write_emb(
            spark, tmp_path, f"xt{i}",
            [(d, _VECS[d]) for d, _ in _RUNS[i]],
        )
        curate_corpus(
            spark, docs, str(tmp_path / f"xto{i}"),
            corpus_index_dir=mh_t,
            embeddings_path=emb, embedding_index_dir=em_t,
        )
    follow = [
        (100, _RUNS[0][0][1]),  # text-dup of doc 0 → MinHash reject
        (99, ["quince", "rose", "sage", "thyme", "umber", "vine"]),
    ]
    follow_emb = [(100, _VECS[0]), (99, _VECS[10])]  # 99: dup of doc 10
    outs = {}
    for tag, (m_ix, e_ix) in (("c", (mh, em)), ("t", (mh_t, em_t))):
        docs = _write_docs(spark, tmp_path, f"xf{tag}", follow)
        emb = _write_emb(spark, tmp_path, f"xf{tag}", follow_emb)
        outs[tag] = curate_corpus(
            spark, docs, str(tmp_path / f"xf{tag}_out"),
            corpus_index_dir=m_ix,
            embeddings_path=emb, embedding_index_dir=e_ix,
        )
    for key in ("n_curated", "n_near_dup_rejected",
                "n_embedding_dup_rejected"):
        assert outs["c"][key] == outs["t"][key], key
    assert outs["c"]["n_near_dup_rejected"] == 1  # doc 100
    assert outs["c"]["n_embedding_dup_rejected"] == 1  # doc 99
    assert outs["c"]["n_curated"] == 0


def test_gc_strays_age_gated(spark, tmp_path):  # noqa: F811
    """The stray vacuum removes crash artifacts PAST the age gate and
    keeps recent ones (presumed in-flight staging); committed data is
    never touched, and the index answers identically afterwards."""
    import time

    from yelp_recommender_spark.curate import curate_corpus
    from yelp_recommender_spark.indexmaint import check_index, gc_strays

    idx = str(tmp_path / "gc")
    _ingest_n_runs(spark, tmp_path, idx, 2, "g")

    # plant two crash artifacts: a stray data run and a dangling intent
    spark.createDataFrame(
        [(999, "deadbeef")], "doc_id long, bk string"
    ).write.parquet(idx + "/band_keys/run_id=oldstray")
    with open(idx + "/commits/rdead.txn", "w") as f:
        json.dump({"txn_file": idx + "/commits/txn-never.json",
                   "txn_id": "never"}, f)

    # recent artifacts survive the default gate
    rep = gc_strays(idx)
    assert rep["removed_stray_dirs"] == []
    assert rep["removed_dangling_intents"] == 0
    assert rep["kept_recent"] == 2

    # age them past the gate (virtual clock via now=)
    future = time.time() + 25 * 3600
    rep = gc_strays(idx, older_than_hours=24.0, now=future)
    assert rep["removed_stray_dirs"] == ["band_keys/run_id=oldstray"]
    assert rep["removed_dangling_intents"] == 1
    doc = check_index(idx)
    assert doc["ok"] and doc["stray_runs"] == 0
    assert doc["committed_runs"] == 2  # committed data untouched

    # the swept index still rejects a known duplicate
    docs = _write_docs(spark, tmp_path, "gf", [(100, _RUNS[0][0][1])])
    r = curate_corpus(
        spark, docs, str(tmp_path / "gf_out"), corpus_index_dir=idx
    )
    assert r["n_near_dup_rejected"] == 1


def test_gc_strays_cli_flag(spark, tmp_path, capsys):  # noqa: F811
    from yelp_recommender_spark import cli

    idx = str(tmp_path / "gcc")
    _ingest_n_runs(spark, tmp_path, idx, 2, "h")
    spark.createDataFrame(
        [(999, "deadbeef")], "doc_id long, bk string"
    ).write.parquet(idx + "/band_keys/run_id=stray")
    cli.main([
        "maintain", "--index", idx, "--gc-strays",
        "--older-than-hours", "0",
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["compacted"]
    assert rep["gc"]["removed_stray_dirs"] == ["band_keys/run_id=stray"]
