"""Unit tests for connected-components duplicate-cluster resolution and
the two new dedup pair generators (SimHash hamming bands, incremental
MinHash). Oracle-level coverage lives in test_queries_vs_oracle.py
(q68/q69/q70)."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def _edges(spark, pairs):  # noqa: F811
    return spark.createDataFrame(pairs, "d1 long, d2 long")


def test_cc_chain_and_separate_component(spark):  # noqa: F811
    """Chain 1-2-3 plus pair (10, 11): min-label flooding must cross the
    chain (pairwise dropping would not connect 1 and 3)."""
    from yelp_recommender_spark.operators.cc import connected_components

    got = connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11)]))
    assert {(r.id, r.component) for r in got.collect()} == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
    }


def test_cc_long_chain_converges_and_respects_max_iter(spark):  # noqa: F811
    """A 6-node path converges (4 star-contraction rounds measured) and
    the operator still raises when the budget cannot reach fixpoint
    (silent wrong answers are the failure mode)."""
    from yelp_recommender_spark.operators.cc import connected_components

    chain = [(i, i + 1) for i in range(1, 6)]
    got = connected_components(_edges(spark, chain))
    assert {r.component for r in got.collect()} == {1}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, chain), max_iter=2)


def test_cc_star_contraction_rounds_far_below_diameter(spark):  # noqa: F811
    """The r5 verdict's adversarial shape: a 200-node path (diameter
    199). Large-star/small-star must converge in O(log² n) rounds —
    max_iter=12 is the pin (9 rounds measured) — where one-hop
    min-label propagation needs ~199 rounds and must raise under the
    same budget. Both agree with the contract on the result."""
    from yelp_recommender_spark.operators.cc import (
        connected_components,
        connected_components_labelprop,
    )

    path = [(i, i + 1) for i in range(1, 200)]
    got = connected_components(_edges(spark, path), max_iter=12)
    rows = {(r.id, r.component) for r in got.collect()}
    assert rows == {(i, 1) for i in range(1, 201)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_labelprop(_edges(spark, path), max_iter=12)


def test_cc_star_and_labelprop_agree(spark):  # noqa: F811
    """Parity of the two algorithms on a mixed graph (cliques, a chain,
    a self-loop, singleton-pair) — identical (id, component) sets."""
    import itertools
    import random

    from yelp_recommender_spark.operators.cc import (
        connected_components,
        connected_components_labelprop,
    )

    rng = random.Random(5)
    edges = [(a, b) for a, b in itertools.combinations(range(10, 16), 2)]
    edges += [(i, i + 1) for i in range(30, 38)]
    edges += [(50, 50), (60, 61)]
    edges += [(rng.randrange(70, 90), rng.randrange(70, 90))
              for _ in range(25)]
    star = connected_components(_edges(spark, edges))
    prop = connected_components_labelprop(_edges(spark, edges))
    assert {(r.id, r.component) for r in star.collect()} == {
        (r.id, r.component) for r in prop.collect()
    }


def test_cc_empty_edges(spark):  # noqa: F811
    from yelp_recommender_spark.operators.cc import connected_components

    assert connected_components(_edges(spark, [])).count() == 0


def test_dedup_representatives_covers_unpaired_docs(spark):  # noqa: F811
    from yelp_recommender_spark.operators.cc import dedup_representatives

    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = _edges(spark, [(2, 4), (4, 5)])
    got = {
        (r.doc_id, r.representative)
        for r in dedup_representatives(docs, pairs).collect()
    }
    assert got == {(1, 1), (2, 2), (3, 3), (4, 2), (5, 2)}


# --------------------------------------------------------------------------
def test_simhash_band_layout_partitions_all_bits():
    from yelp_recommender_spark.operators.dedup import simhash_band_layout

    for bits, k in [(16, 2), (63, 2), (64, 3), (7, 6)]:
        layout = simhash_band_layout(bits, k)
        assert len(layout) == k + 1
        # contiguous, non-overlapping, covers [0, bits)
        assert layout[0][0] == 0
        for (o1, w1), (o2, _) in zip(layout, layout[1:]):
            assert o1 + w1 == o2
        assert layout[-1][0] + layout[-1][1] == bits
    with pytest.raises(ValueError):
        simhash_band_layout(2, 2)  # 3 bands need >= 3 bits


def test_simhash_hamming_pairs_exact_by_pigeonhole(spark):  # noqa: F811
    """Every pair within hamming k must be found (pigeonhole guarantee),
    every pair beyond k must be absent — checked against a brute-force
    python computation over a width where bands are tiny (16 bits, so a
    band-collision miss would be loud)."""
    from yelp_recommender_spark.operators.dedup import simhash_hamming_pairs

    hashes = [0b0, 0b1, 0b111, 0b1111111, (1 << 16) - 1, 0b1, 0b110]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "doc_id long, simhash long"
    )
    got = {
        (r.d1, r.d2, r.hamming)
        for r in simhash_hamming_pairs(df, bits=16, k=2).collect()
    }
    want = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= 2:
                want.add((i, j, d))
    assert got == want
    assert (0, 5, 1) in got  # duplicate hash values pair up at distance 1


def test_incremental_dedup_prefers_corpus_then_earlier_batch(spark):  # noqa: F811
    """Batch doc 101 duplicates corpus doc 1 (reported, dup_of=1); batch
    doc 104 duplicates batch doc 102 (reported, dup_of=102 — the earlier
    batch doc wins); 102 and 103 are clean (absent — 102 matches nothing
    in the corpus and only a LATER batch doc, which must not reject it)."""
    from yelp_recommender_spark.operators.dedup import incremental_minhash_dedup

    tmpl = [f"s{i}" for i in range(10)]
    corpus = spark.createDataFrame(
        [(1, tmpl), (2, [f"x{i}" for i in range(10)])],
        "doc_id long, shingles array<string>",
    )
    other = [f"y{i}" for i in range(10)]
    batch = spark.createDataFrame(
        [(101, tmpl), (102, other), (104, other), (103, [f"z{i}" for i in range(10)])],
        "doc_id long, shingles array<string>",
    )
    got = {
        (r.doc_id, r.dup_of, r.jaccard)
        for r in incremental_minhash_dedup(
            batch, corpus, n_hashes=16, bands=8, threshold=0.8
        ).collect()
    }
    assert got == {(101, 1, 1.0), (104, 102, 1.0)}
