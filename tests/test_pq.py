"""Product-quantization ANN tier (operators/pq.py): recall on planted
clusters, determinism across partitionings, empty-input guards, padding
for dims not divisible by m, and the reconstruction-error bound."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401 (fixture)

DIM = 32
N_BASE = 40
COPIES = 3


@pytest.fixture(scope="module")
def neardup_df(spark):  # noqa: F811
    # same planted-cluster construction as tests/test_ann.py: 40 bases ×
    # 3 near-identical copies — each vector's true top-2 neighbors are
    # its same-base siblings at cos ≈ 0.9999
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N_BASE, DIM))
    rows = []
    vid = 0
    for i in range(N_BASE):
        for _ in range(COPIES):
            noisy = base[i] + 0.01 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in noisy]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_pq_topk_finds_planted_neighbors(neardup_df):
    from yelp_recommender_spark.operators.pq import pq_topk

    got = pq_topk(neardup_df, neardup_df, k=2, m=8, ksub=64).collect()
    # full contract: every vector queried, 2 neighbors each
    assert len(got) == N_BASE * COPIES * 2
    hit = sum(
        1 for r in got if r.neighbor_id // COPIES == r.query_id // COPIES
    )
    recall = hit / len(got)
    # quantized scores must still rank the cos≈0.9999 siblings first
    assert recall >= 0.95, recall
    # ADC estimates a near-1 cosine for the planted pairs
    sib = [r.cos_pq for r in got if r.neighbor_id // COPIES == r.query_id // COPIES]
    assert min(sib) > 0.8


def test_pq_scores_close_to_exact(neardup_df):
    from yelp_recommender_spark.operators.ann import cosine_topk
    from yelp_recommender_spark.operators.pq import pq_topk

    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in cosine_topk(neardup_df, neardup_df, k=2).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id): r.cos_pq
        for r in pq_topk(neardup_df, neardup_df, k=2, m=8, ksub=64).collect()
    }
    common = set(exact) & set(approx)
    assert len(common) >= 0.9 * len(exact)
    errs = [abs(exact[p] - approx[p]) for p in common]
    assert max(errs) < 0.2 and sum(errs) / len(errs) < 0.05


def test_pq_encode_deterministic_across_partitionings(neardup_df):
    from yelp_recommender_spark.operators.pq import (
        pq_encode,
        train_codebooks,
    )

    books = train_codebooks(neardup_df, m=8, ksub=32)
    a = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(neardup_df, books).collect()
    }
    b = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(neardup_df.repartition(7), books).collect()
    }
    assert a == b
    assert all(len(c) == 8 and max(c) < 32 for c in a.values())


def test_pq_empty_index_guard(neardup_df, spark):  # noqa: F811
    from yelp_recommender_spark.operators.pq import pq_topk, train_codebooks

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = pq_topk(neardup_df, empty, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cos_pq", "rank",
    ]
    with pytest.raises(ValueError):
        train_codebooks(empty)


def test_pq_pads_non_divisible_dim(spark):  # noqa: F811
    from yelp_recommender_spark.operators.pq import pq_topk

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((30, 30))  # 30 % 8 != 0 → zero padding
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    got = pq_topk(df, df, k=3, m=8, ksub=16)
    rows = got.collect()
    assert len(rows) == 30 * 3
    assert all(r.query_id != r.neighbor_id for r in rows)
    # deterministic rank ties: rank is 1..3 per query
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


def test_pq_reconstruction_error_bounds_score_bias(neardup_df):
    """|cos − cos_pq| ≤ reconstruction error of the neighbor (Cauchy–
    Schwarz with a unit query) — the analytic handle PQ offers in place
    of LSH's collision bound."""
    from yelp_recommender_spark.operators.ann import cosine_topk
    from yelp_recommender_spark.operators.pq import (
        pq_reconstruct_error,
        pq_topk,
        train_codebooks,
    )

    books = train_codebooks(neardup_df, m=8, ksub=64)
    err = {
        r.vec_id: r.err
        for r in pq_reconstruct_error(neardup_df, books).collect()
    }
    assert all(e >= 0.0 for e in err.values())
    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in cosine_topk(neardup_df, neardup_df, k=2).collect()
    }
    approx = pq_topk(
        neardup_df, neardup_df, k=2, m=8, ksub=64, codebooks=books
    ).collect()
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert abs(exact[key] - r.cos_pq) <= err[r.neighbor_id] + 1e-5


def test_ivfpq_topk_finds_planted_neighbors(neardup_df):
    """The fully composed no-broadcast path: IVF routing × PQ codes.
    On the planted-cluster fixture, same-base siblings sit at
    cos ≈ 0.9999 and cluster naturally, so routing keeps them together
    and quantized scores still rank them first."""
    from yelp_recommender_spark.operators.pq import ivfpq_topk

    got = ivfpq_topk(
        neardup_df, neardup_df, k=2,
        n_centroids=8, n_probe=4, m=8, ksub=32,
    ).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) == N_BASE * COPIES  # every query answered
    hit = sum(
        1 for r in got if r.neighbor_id // COPIES == r.query_id // COPIES
    )
    assert hit / len(got) >= 0.9, hit / len(got)
    # ranks well-formed and deterministic ties
    assert all(sorted(x.rank for x in v) == list(range(1, len(v) + 1))
               for v in per_q.values())


def test_ivfpq_empty_index_guard(neardup_df, spark):  # noqa: F811
    from yelp_recommender_spark.operators.pq import ivfpq_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = ivfpq_topk(neardup_df, empty, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cos_pq", "rank",
    ]


def test_codebook_parquet_round_trip(neardup_df, spark, tmp_path):  # noqa: F811
    import numpy as np

    from yelp_recommender_spark.operators.pq import (
        codebooks_from_df,
        codebooks_to_df,
        pq_encode,
        train_codebooks,
    )

    books = train_codebooks(neardup_df, m=8, ksub=16)
    path = str(tmp_path / "codebooks")
    codebooks_to_df(spark, books).write.parquet(path)
    back = codebooks_from_df(spark.read.parquet(path))
    assert back.shape == books.shape
    assert np.array_equal(back, books)  # bit-exact round trip
    # and encoding under the reloaded books is identical
    a = {r.vec_id: tuple(r.codes) for r in pq_encode(neardup_df, books).collect()}
    b = {r.vec_id: tuple(r.codes) for r in pq_encode(neardup_df, back).collect()}
    assert a == b


def test_ivfpq_index_persists_and_serves(spark, tmp_path):  # noqa: F811
    """Train + encode once, persist codes/centers/codebooks to parquet,
    serve from the reloaded artifacts — identical to the inline path."""
    from tests.conftest import SF_DIR

    from yelp_recommender_spark.operators.ann import (
        centers_from_df,
        centers_to_df,
        ivf_fit_assign,
    )
    from yelp_recommender_spark.operators.pq import (
        codebooks_from_df,
        codebooks_to_df,
        ivfpq_topk,
        ivfpq_topk_indexed,
        pq_encode,
        train_codebooks,
    )

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet").limit(300)
    queries = emb.limit(15)
    kw = dict(k=5, n_centroids=8, n_probe=8, m=4, ksub=16)

    inline = sorted(
        tuple(r) for r in ivfpq_topk(queries, emb, **kw).collect()
    )

    assigned, centers = ivf_fit_assign(emb, n_centroids=8)
    books = train_codebooks(assigned, vec_col="vec", m=4, ksub=16)
    coded = pq_encode(assigned, books, "vec_id", "vec",
                      passthrough=["centroid_id"])
    for df, name in [
        (coded, "codes"),
        (centers_to_df(spark, centers), "centers"),
        (codebooks_to_df(spark, books), "books"),
    ]:
        df.write.parquet(str(tmp_path / name))
    served = sorted(
        tuple(r)
        for r in ivfpq_topk_indexed(
            queries,
            spark.read.parquet(str(tmp_path / "codes")),
            centers_from_df(spark.read.parquet(str(tmp_path / "centers"))),
            codebooks_from_df(spark.read.parquet(str(tmp_path / "books"))),
            k=5,
            n_probe=8,
        ).collect()
    )
    assert inline == served and len(served) > 0
