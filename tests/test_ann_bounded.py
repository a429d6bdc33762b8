"""Bounded-output near-dup contract (VERDICT r5 #2): "all pairs above
τ" is Ω(output) by contract — q88 measured 11× pairs for 10× docs — so
``max_pairs_per_doc`` caps each document to its top-k partners with a
per-doc exclusion audit (q35's blind-spot-audit convention). These pins:
the bounded result against a numpy brute force, the audit arithmetic,
the O(n·k) output bound on an adversarial clique, LSH/auto parity, and
output linearity across a real scale decade."""

from __future__ import annotations

import os

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

TAU = 0.4
K = 3


@pytest.fixture(scope="module")
def clustered(spark):  # noqa: F811
    """Three tight clusters (within-cluster cos ≈ 1) + isolated noise —
    every within-cluster pair clears τ, so per-doc n_above is the
    cluster size − 1 and the cap bites on the big cluster."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((3, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for ci, size in enumerate((8, 5, 2)):  # 8-clique > K, 5 > K, pair
        for _ in range(size):
            v = centers[ci] + 0.01 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(10):  # isolated noise, likely below τ of everything
        v = rng.standard_normal(16)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, rows


def _brute(rows, tau=TAU, k=None):
    """Expected pairs and per-doc counts from numpy: per-doc top-k by
    (cos desc, id asc), union over endpoints, canonical (id1 < id2).
    Threshold on the UNROUNDED cosine, rounded output (the pairs
    contract)."""
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    raw = mat @ mat.T
    n_above = {}
    kept_edges = set()
    for i in range(len(ids)):
        cand = [
            (float(np.round(raw[i, j], 6)), int(ids[j]))
            for j in range(len(ids))
            if j != i and raw[i, j] >= tau
        ]
        n_above[int(ids[i])] = len(cand)
        cand.sort(key=lambda t: (-t[0], t[1]))
        for c, j in cand if k is None else cand[:k]:
            kept_edges.add((min(int(ids[i]), j), max(int(ids[i]), j), c))
    return kept_edges, n_above


def test_bounded_pairs_match_bruteforce(clustered):
    from yelp_recommender_spark.operators.ann import cosine_pairs_above

    df, rows = clustered
    got = {
        (r.id1, r.id2, r.cos)
        for r in cosine_pairs_above(
            df, threshold=TAU, max_pairs_per_doc=K
        ).collect()
    }
    expected, _ = _brute(rows, k=K)
    assert got == expected


def test_audit_counts_match_bruteforce(clustered):
    from yelp_recommender_spark.operators.ann import (
        bounded_pairs_audit,
        cosine_pairs_above,
        cosine_partners_topk,
    )

    df, rows = clustered
    partners = cosine_partners_topk(df, df, threshold=TAU, k=K)
    audit = {r.doc_id: r for r in bounded_pairs_audit(partners).collect()}
    _, n_above = _brute(rows)
    for doc, n in n_above.items():
        if n == 0:
            assert doc not in audit  # nothing cleared τ, nothing excluded
            continue
        a = audit[doc]
        assert a.n_above == n
        assert a.n_kept == min(K, n)
        assert a.n_excluded == n - min(K, n)
    # global cross-check: Σ n_above double-counts every unbounded pair
    unbounded = cosine_pairs_above(df, threshold=TAU).count()
    assert sum(a.n_above for a in audit.values()) == 2 * unbounded


def test_output_bounded_on_adversarial_clique(spark):  # noqa: F811
    """A 60-clique: the unbounded contract is C(60,2) = 1770 pairs; the
    bounded one is ≤ n·k with every exclusion counted."""
    from yelp_recommender_spark.operators.ann import (
        bounded_pairs_audit,
        cosine_pairs_above,
        cosine_partners_topk,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [
        (i, [float(x) for x in base + 0.001 * rng.standard_normal(16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert cosine_pairs_above(df, threshold=TAU).count() == 1770
    bounded = cosine_pairs_above(df, threshold=TAU, max_pairs_per_doc=K)
    n_bounded = bounded.count()
    assert n_bounded <= 60 * K
    audit = bounded_pairs_audit(
        cosine_partners_topk(df, df, threshold=TAU, k=K)
    )
    rows_a = audit.collect()
    assert all(r.n_above == 59 and r.n_kept == K for r in rows_a)
    assert sum(r.n_excluded for r in rows_a) == 60 * (59 - K)


def test_lsh_bounded_matches_exact_on_tight_clusters(clustered):
    """Within-cluster pairs sit at cos ≈ 1 → SRP collision probability
    ≈ 1 per table, so the LSH tier recalls them deterministically and
    the bounded result equals the exact tier's."""
    from yelp_recommender_spark.operators.ann import (
        cosine_pairs_above,
        cosine_pairs_above_lsh,
    )

    df, _ = clustered
    exact = cosine_pairs_above(
        df, threshold=0.9, max_pairs_per_doc=K
    )
    lsh = cosine_pairs_above_lsh(
        df, threshold=0.9, max_pairs_per_doc=K, target_recall=0.99
    )
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, lsh.collect())
    )


def test_auto_passes_cap_to_both_tiers(clustered):
    from yelp_recommender_spark.operators.ann import (
        cosine_pairs_above,
        cosine_pairs_above_auto,
        cosine_pairs_above_lsh,
    )

    df, _ = clustered
    via_exact = cosine_pairs_above_auto(
        df, threshold=0.9, max_pairs_per_doc=K
    )
    assert sorted(map(tuple, via_exact.collect())) == sorted(
        map(tuple, cosine_pairs_above(
            df, threshold=0.9, max_pairs_per_doc=K
        ).collect())
    )
    via_lsh = cosine_pairs_above_auto(
        df, threshold=0.9, max_pairs_per_doc=K, broadcast_limit=1,
        target_recall=0.99,
    )
    assert sorted(map(tuple, via_lsh.collect())) == sorted(
        map(tuple, cosine_pairs_above_lsh(
            df, threshold=0.9, max_pairs_per_doc=K, target_recall=0.99
        ).collect())
    )


def test_partners_planner_parity_on_both_tiers(clustered):
    """cosine_partners_above_auto (VERDICT r6 #1 — the production
    bounded entry point that keeps the audit columns) must be the same
    computation as the tier it routes to: on the exact tier, identical
    to cosine_partners_topk; on the LSH tier, its pairs projection
    identical to the bounded cosine_pairs_above_lsh (same kernel path,
    deterministic on tight clusters)."""
    from yelp_recommender_spark.operators.ann import (
        cosine_pairs_above_lsh,
        cosine_partners_above_auto,
        cosine_partners_topk,
        partners_to_pairs,
    )

    df, _ = clustered
    via_exact = cosine_partners_above_auto(df, threshold=0.9, k=K)
    direct = cosine_partners_topk(df, df, threshold=0.9, k=K)
    assert sorted(map(tuple, via_exact.collect())) == sorted(
        map(tuple, direct.collect())
    )
    via_lsh = cosine_partners_above_auto(
        df, threshold=0.9, k=K, broadcast_limit=1, target_recall=0.99
    )
    assert via_lsh.columns == ["doc_id", "partner_id", "cos", "n_above"]
    assert sorted(
        map(tuple, partners_to_pairs(via_lsh).collect())
    ) == sorted(
        map(tuple, cosine_pairs_above_lsh(
            df, threshold=0.9, max_pairs_per_doc=K, target_recall=0.99
        ).collect())
    )


def test_bounded_output_linear_across_decade(spark):  # noqa: F811
    """Real embeddings, one measured scale step (sf0.01 → sf0.1, 4×
    embedding rows) at a NON-SELECTIVE threshold (τ=0.2, where the cap
    actually binds): the unbounded contract's output grows with pair
    density (measured ~15.8× for 4× rows — the q88 shape), the bounded
    contract's stays within a whisker of the row ratio and under n·k.
    Measured values for orientation: unbounded 6 940 → 109 676 pairs;
    bounded 1 579 → 6 200."""
    from yelp_recommender_spark.operators.ann import cosine_pairs_above
    from yelp_recommender_spark.sources.tables import load_tables

    tau = 0.2
    bounded, unbounded, rows = {}, {}, {}
    for sf in ("sf0.01", "sf0.1"):
        emb = load_tables(spark, f"/root/testdata/{sf}", ["embeddings"])[
            "embeddings"
        ]
        rows[sf] = emb.count()
        unbounded[sf] = cosine_pairs_above(emb, threshold=tau).count()
        out = cosine_pairs_above(
            emb, threshold=tau, max_pairs_per_doc=5
        ).count()
        assert out <= rows[sf] * 5  # the O(n·k) contract
        bounded[sf] = out
    row_ratio = rows["sf0.1"] / rows["sf0.01"]
    # bounded output tracks rows (≤ 1.25× the row ratio); the threshold
    # contract demonstrably does not (> 2× the row ratio here)
    assert bounded["sf0.1"] <= 1.25 * row_ratio * bounded["sf0.01"]
    assert unbounded["sf0.1"] > 2 * row_ratio * unbounded["sf0.01"]


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF1"),
    reason="second-decade sweep is opt-in (amplifies ~170 MB); "
    "set SPARK_GRAFT_SWEEP_SF1=1",
)
def test_bounded_output_linear_second_decade(spark):  # noqa: F811
    """sf0.1 → amplified sf1 (10× again): the bounded contract's output
    stays O(n·k) — the point of VERDICT r5 #2, measured where q88's
    unbounded contract grew 11×-pairs-per-10×-docs."""
    from yelp_recommender_spark.amplify import amplify
    from yelp_recommender_spark.operators.ann import cosine_pairs_above
    from yelp_recommender_spark.sources.tables import load_tables

    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scale_data", "sf1"),
    )
    amplify("/root/testdata/sf0.1", sf1_dir, 10)
    counts = {}
    for tag, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
        emb = load_tables(spark, d, ["embeddings"])["embeddings"]
        n = emb.count()
        out = cosine_pairs_above(
            emb, threshold=0.2, max_pairs_per_doc=5
        ).count()
        assert out <= n * 5
        counts[tag] = out
    assert counts["sf1"] <= 12 * counts["sf0.1"]


# -------------------------------------------------- incremental (batch × corpus)
def _inc_fixture(spark):
    """Corpus of 3 tight clusters + a batch holding: one dup per corpus
    cluster, one within-batch near-pair, and noise."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((3, 12))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    corpus_rows, batch_rows, vid = [], [], 0
    for ci in range(3):
        for _ in range(4):
            v = centers[ci] + 0.01 * rng.standard_normal(12)
            corpus_rows.append((vid, [float(x) for x in v]))
            vid += 1
    for ci in range(3):
        v = centers[ci] + 0.01 * rng.standard_normal(12)
        batch_rows.append((100 + ci, [float(x) for x in v]))
    w = rng.standard_normal(12)
    for i in (103, 104):
        batch_rows.append(
            (i, [float(x) for x in w + 0.01 * rng.standard_normal(12)])
        )
    for i in range(3):
        batch_rows.append(
            (105 + i, [float(x) for x in rng.standard_normal(12)])
        )
    schema = "vec_id long, embedding array<double>"
    return (
        spark.createDataFrame(corpus_rows, schema),
        spark.createDataFrame(batch_rows, schema),
        corpus_rows,
        batch_rows,
    )


def _inc_brute(corpus_rows, batch_rows, tau):
    allr = corpus_rows + batch_rows
    ids = np.array([r[0] for r in allr])
    mat = np.array([r[1] for r in allr], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    corp = np.arange(len(ids)) < len(corpus_rows)
    out = {}
    for bid, bv in batch_rows:
        q = np.array(bv)
        q = q / np.linalg.norm(q)
        sims = mat @ q
        mask = (corp | (ids < bid)) & (ids != bid) & (sims >= tau)
        if not mask.any():
            continue
        cs, ci = np.round(sims[mask], 6), ids[mask]
        best = np.lexsort((ci, -cs))[0]
        out[bid] = (int(ci[best]), float(cs[best]))
    return out


def test_embedding_incremental_matches_brute_both_tiers(spark):  # noqa: F811
    """embedding_incremental_dedup — the vector twin of the MinHash
    ingest rejection (corpus docs + smaller-id batch docs qualify as
    partners; best = max cos, ties min id) — must equal a numpy brute
    force on BOTH planner tiers (tight clusters → LSH recall is
    deterministic ≈ 1)."""
    from yelp_recommender_spark.operators.ann import (
        embedding_incremental_dedup,
    )

    corpus, batch, corpus_rows, batch_rows = _inc_fixture(spark)
    want = _inc_brute(corpus_rows, batch_rows, 0.9)
    assert want, "fixture planted no rejections"
    exact = {
        r.doc_id: (r.dup_of, r.cos)
        for r in embedding_incremental_dedup(
            batch, corpus, threshold=0.9
        ).collect()
    }
    assert exact == want
    lsh = {
        r.doc_id: (r.dup_of, r.cos)
        for r in embedding_incremental_dedup(
            batch, corpus, threshold=0.9, broadcast_limit=1,
            target_recall=0.99,
        ).collect()
    }
    assert lsh == want
    # the within-batch pair respects keep-first: the larger id rejects
    assert 104 in want and want[104][0] == 103 and 103 not in want


def test_embedding_incremental_empty_cases(spark):  # noqa: F811
    from yelp_recommender_spark.operators.ann import (
        embedding_incremental_dedup,
    )

    corpus, batch, _, batch_rows = _inc_fixture(spark)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    # empty corpus = first ingest: only the within-batch keep-first rule
    first = {
        r.doc_id: r.dup_of
        for r in embedding_incremental_dedup(
            batch, empty, threshold=0.9
        ).collect()
    }
    assert first == {104: 103}
    # empty batch: nothing to reject, schema intact
    out = embedding_incremental_dedup(empty, corpus, threshold=0.9)
    assert out.columns == ["doc_id", "dup_of", "cos"]
    assert out.collect() == []
