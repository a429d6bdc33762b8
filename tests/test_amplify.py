"""Amplifier invariants (yelp_recommender_spark/amplify.py): K× the
rows, disjoint keys per copy, referential integrity preserved exactly,
schemas bit-identical, token-disjoint document copies, distinct
perturbed embeddings — and the engine/oracle parity holds unchanged on
an amplified directory (the property that makes BENCH/sweep runs at an
amplified scale meaningful)."""

from __future__ import annotations

import json
import os

import duckdb
import pyarrow.parquet as pq
import pytest

from tests.conftest import register_duck_views
from tests.oracle_harness import compare_query

from yelp_recommender_spark.amplify import (
    DIM_TABLES,
    FACT_TABLES,
    KEY_DOMAINS,
    amplify,
)

SRC = "/root/testdata/sf0.001"
FACTOR = 3


@pytest.fixture(scope="module")
def amp_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("amp") / "sf_amp")
    amplify(SRC, out, FACTOR)
    return out


@pytest.fixture(scope="module")
def duck(amp_dir):
    con = duckdb.connect()
    register_duck_views(con, amp_dir)
    return con


def test_row_counts(amp_dir, duck):
    for t in FACT_TABLES:
        n_src = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
        n_amp = duck.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        assert n_amp == FACTOR * n_src, t
    for t in DIM_TABLES:
        n_src = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
        n_amp = duck.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        assert n_amp == n_src, t


def test_schemas_identical(amp_dir):
    for t in FACT_TABLES + DIM_TABLES:
        s_src = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        s_amp = pq.read_schema(os.path.join(amp_dir, f"{t}.parquet"))
        assert s_src.equals(s_amp), f"{t}: {s_src} != {s_amp}"


def test_owner_keys_disjoint_across_copies(amp_dir, duck):
    # every owner key column must stay unique after amplification — an
    # offset collision would silently merge entities from two copies
    for domain, refs in KEY_DOMAINS.items():
        table, col = refs[0]
        if domain == "userkey":
            continue  # user_id is not unique per row even in the source
        n, d = duck.execute(
            f"SELECT count(*), count(DISTINCT {col}) FROM {table}"
        ).fetchone()
        assert n == d, f"{domain}: {n} rows but {d} distinct {col}"


def test_referential_integrity(duck):
    fks = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    for child, fk, parent, pk in fks:
        dangling = duck.execute(
            f"SELECT count(*) FROM {child} c LEFT JOIN {parent} p "
            f"ON c.{fk} = p.{pk} WHERE p.{pk} IS NULL"
        ).fetchone()[0]
        assert dangling == 0, f"{child}.{fk} -> {parent}.{pk}"


def test_documents_token_disjoint_and_nchars(amp_dir, duck):
    # n_chars == length(text) must survive the salting
    bad = duck.execute(
        "SELECT count(*) FROM documents WHERE n_chars <> length(text)"
    ).fetchone()[0]
    assert bad == 0
    # copies share zero tokens: the dedup/similarity workload grows
    # linearly with the corpus instead of forming K-clique dup groups
    stride = json.load(open(os.path.join(amp_dir, "MANIFEST.json")))[
        "strides"
    ]["dockey"]
    overlap = duck.execute(
        f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                     FROM documents)
        SELECT count(*) FROM (
            SELECT w FROM tok WHERE doc_id < {stride}
            INTERSECT
            SELECT w FROM tok WHERE doc_id >= {stride}
        )
        """
    ).fetchone()[0]
    assert overlap == 0


def test_copy0_is_source_verbatim(amp_dir, duck):
    duck.execute(
        f"CREATE OR REPLACE VIEW src_docs AS "
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
    )
    diff = duck.execute(
        "SELECT count(*) FROM (SELECT * FROM documents "
        "WHERE doc_id IN (SELECT doc_id FROM src_docs) "
        "EXCEPT SELECT * FROM src_docs)"
    ).fetchone()[0]
    assert diff == 0


def test_embeddings_distinct_but_same_shape(duck):
    dims = duck.execute(
        "SELECT DISTINCT len(embedding) FROM embeddings"
    ).fetchall()
    assert len(dims) == 1
    n, d = duck.execute(
        "SELECT count(*), count(DISTINCT embedding::VARCHAR) FROM embeddings"
    ).fetchone()
    assert n == d, "perturbation left exact duplicate vectors"


def _mini_src_with_docs(tmp_path, texts):
    """A source sf dir: every real sf0.001 table symlinked, documents
    replaced by a synthetic corpus with the given texts."""
    import pyarrow as pa

    src = tmp_path / "mini_src"
    src.mkdir()
    for t in FACT_TABLES + DIM_TABLES:
        if t != "documents":
            os.symlink(
                os.path.join(SRC, f"{t}.parquet"), src / f"{t}.parquet"
            )
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, src / "documents.parquet")
    return str(src)


def test_salt_disjoint_on_adversarial_tokens(tmp_path):
    """The r5 suffix-only collisions (ADVICE r5): a source holding both
    'item' and 'item1' (copy-i salt of the former == verbatim latter
    under suffix-only salting) and factor > 10 (copy 1 of 'x1' == copy
    11 of 'x'). With the separator scheme every copy pair must share
    zero tokens."""
    src = _mini_src_with_docs(
        tmp_path, ["item item1 x x1 x11", "item1 x11 item"]
    )
    out = str(tmp_path / "amp")
    m = amplify(src, out, 12, tables=["documents"])
    stride = m["strides"]["dockey"]
    con = duckdb.connect()
    toks = con.execute(
        f"""
        WITH tok AS (
            SELECT doc_id // {stride} AS copy,
                   unnest(string_split(text, ' ')) AS w
            FROM read_parquet('{out}/documents.parquet'))
        SELECT count(*) FROM (
            SELECT w FROM tok GROUP BY w HAVING count(DISTINCT copy) > 1)
        """
    ).fetchone()[0]
    assert toks == 0, "cross-copy token overlap under separator salting"


def test_salt_separator_in_source_is_refused(tmp_path):
    from yelp_recommender_spark.amplify import SALT_SEP

    src = _mini_src_with_docs(tmp_path, [f"plain to{SALT_SEP}ken"])
    with pytest.raises(ValueError, match="salt separator"):
        amplify(src, str(tmp_path / "amp2"), 2, tables=["documents"])


def test_stale_salt_scheme_is_rebuilt_not_refused(tmp_path):
    """A directory amplified under an older salt scheme (manifest lacks
    the current salt_sep) is rebuilt in place for the same request —
    a version bump of ours, not a caller parameter conflict."""
    src = _mini_src_with_docs(tmp_path, ["alpha beta", "gamma"])
    out = str(tmp_path / "amp3")
    amplify(src, out, 2, tables=["documents"])
    mp = os.path.join(out, "MANIFEST.json")
    stale = json.load(open(mp))
    stale["salt_sep"] = "OLD"
    json.dump(stale, open(mp, "w"))
    m = amplify(src, out, 2, tables=["documents"])  # no raise
    from yelp_recommender_spark.amplify import SALT_SEP

    assert m["salt_sep"] == SALT_SEP


def test_idempotent_and_param_guard(amp_dir, tmp_path):
    # same params: returns the existing manifest, no rewrite
    before = os.path.getmtime(os.path.join(amp_dir, "lineitem.parquet"))
    m = amplify(SRC, amp_dir, FACTOR)
    assert m["rows"]["lineitem"] > 0
    assert os.path.getmtime(os.path.join(amp_dir, "lineitem.parquet")) == before
    # different params without overwrite: refuse
    with pytest.raises(FileExistsError):
        amplify(SRC, amp_dir, FACTOR + 1)
    with pytest.raises(ValueError):
        amplify(SRC, str(tmp_path / "x"), 0)


# representative slice of the catalog: star-schema agg + join, dedup,
# text, events windowing — parity on the amplified directory proves the
# engine and the oracle agree at the amplified scale, which is what
# makes an amplified bench a valid correctness-carrying artifact
PARITY_QUERIES = [
    "q01_pricing_summary",
    "q05_customer_ltv",
    "q10_supplier_part_overlap",
    "q20_token_stats",
    "q23_language_id",
    "q30_dedup_keep_first",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity_on_amplified_dir(spark, amp_dir, duck, name):
    import yelp_recommender_spark.queries as Q

    df = Q.QUERIES[name](spark, amp_dir)
    res = compare_query(df, duck, Q.ORACLES[name])
    assert res["match"], f"{name}: {res}"
