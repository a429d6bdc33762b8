"""Scale amplifier: replicate a TESTDATA scale-factor directory K× with
foreign-key-consistent key remapping, producing a larger synthetic scale
factor (e.g. sf0.1 × 10 → an sf1-equivalent) for throughput and scaling
measurement.

Why this exists: the driver ships sf0.001/0.01/0.1 (TESTDATA.md); the
engine targets 100 TB. The scale-sweep gate (tests/test_scale_sweep.py)
measures growth over one decade (sf0.01 → sf0.1); amplification extends
the measurement a further decade (→ sf1-equivalent) so "the plans scale"
is a two-decade measured exponent, not an extrapolation from 17 MB.

Semantics per copy ``i`` of ``K`` (copy 0 is the source, verbatim):

- **Key domains** are offset by ``i * stride`` where ``stride`` is
  ``max(key) + 1`` over the domain's OWNER table, so every copy's keys
  are disjoint and every foreign key still lands in the same copy —
  referential integrity is preserved exactly (orders→customer,
  lineitem→orders/part/supplier). This mirrors how TPC-H dbgen scales:
  more keys, identical distributions per key.
- **Dimension tables** (region, nation) are copied once, unchanged —
  TPC-H holds them constant across scale factors, and every copy's
  ``c_nationkey`` still hits the same 25 nations (a realistic fan-in:
  10× customers per nation).
- **documents.text** for copy i>0 rewrites each whitespace token ``w``
  to ``w + SALT_SEP + str(i)`` and recomputes ``n_chars = len(text)``.
  Copies are therefore textually DISJOINT (no cross-copy shingle or
  token overlap), so dedup/similarity workloads grow linearly with the
  corpus, the way a real 10× crawl does — exact replication would
  instead create K-clique duplicate groups and a K² candidate-pair
  blowup that measures the data, not the engine. Copy 0 embeds the
  source corpus verbatim, so every within-copy near-dup the original
  corpus contains appears K times (once per copy, in its own token
  space). Disjointness holds BY CONSTRUCTION for any factor: the
  separator is asserted absent from the source text, so the last
  occurrence of ``SALT_SEP`` in a salted token decomposes it uniquely
  into (source token, copy number) — suffix-only salting (the r5
  scheme) could collide ``'x1'+'1'`` (copy 1) with ``'x'+'11'``
  (copy 11), or a verbatim source token ``'item1'`` with salted
  ``'item'`` in copy 1. The separator is ALPHANUMERIC on purpose: the
  engine's canonical tokenizer maps non-alphanumerics to spaces
  (functions/text.py), so a control-character separator would be
  split off downstream and silently merge the copies back together.
- **embeddings.embedding** for copy i>0 is perturbed with seeded
  Gaussian noise (sigma = 0.05 × per-dataset component std, seed
  ``42 + i``), keeping the distribution's shape while making copies
  distinct vectors — exact duplicates would degenerate ANN ground truth
  (top-k saturated by K identical neighbors).
- **events.ts** is kept verbatim — 10× events over the same time range
  is densification (more traffic), which is exactly what a windowed
  aggregation sees at production scale. The parquet type (INT64
  TIMESTAMP(NANOS)) is preserved bit-for-bit so the amplified directory
  keeps the source's nanos quirk (sources/tables.py:22-28).

Everything is pyarrow-native (no Spark session needed): reading 17 MB
and writing ~170 MB takes seconds. Output layout matches TESTDATA.md
(``{out}/{table}.parquet``), so ``$SPARK_GRAFT_SF_DIR`` and the DuckDB
oracle harness both work on an amplified directory unmodified — the full
catalog and its oracles can run at the amplified scale.

A ``MANIFEST.json`` records source, factor, per-domain strides, and row
counts for provenance; ``amplify()`` refuses to overwrite a directory
whose manifest doesn't match the requested parameters unless
``overwrite=True``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: tables copied once, unchanged (scale-invariant dimensions)
DIM_TABLES = ("region", "nation")

#: key domain -> [(table, column), ...]; the FIRST entry is the owner
#: whose max defines the domain stride, the rest are foreign keys into it
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventkey": [("events", "event_id")],
    "userkey": [("events", "user_id")],
    "dockey": [("documents", "doc_id")],
    "veckey": [("embeddings", "vec_id")],
}

FACT_TABLES = (
    "customer",
    "orders",
    "lineitem",
    "part",
    "supplier",
    "events",
    "documents",
    "embeddings",
)

EMBED_NOISE_SIGMA = 0.05  # × per-dataset component std

#: token-salt separator (module docstring): alphanumeric so the engine's
#: tokenizer keeps it inside the token, rare so the absence assert holds
#: on real corpora; recorded in the manifest so a directory amplified
#: under a different salt scheme is rebuilt, not silently reused
SALT_SEP = "zq9qz"


def _key_columns(table: str) -> dict[str, str]:
    """column name -> domain name, for the given table."""
    out = {}
    for domain, refs in KEY_DOMAINS.items():
        for t, c in refs:
            if t == table:
                out[c] = domain
    return out


def _domain_strides(src: str) -> dict[str, int]:
    """stride per key domain = max over the OWNER table's key + 1."""
    strides = {}
    for domain, refs in KEY_DOMAINS.items():
        owner_table, owner_col = refs[0]
        path = os.path.join(src, f"{owner_table}.parquet")
        col = pq.read_table(path, columns=[owner_col])[owner_col]
        strides[domain] = int(pc.max(col).as_py()) + 1
    return strides


def _assert_salt_separator_absent(table: pa.Table) -> None:
    """Disjointness precondition (module docstring): the separator must
    not appear in the SOURCE text, or salted-token decomposition stops
    being unique. One vectorized substring scan over the source table."""
    hits = pc.sum(
        pc.cast(pc.match_substring(table["text"], SALT_SEP), pa.int64())
    ).as_py()
    if hits:
        raise ValueError(
            f"amplify: salt separator {SALT_SEP!r} occurs in {hits} source "
            "document(s) — cross-copy token disjointness would not hold; "
            "choose a different SALT_SEP for this corpus"
        )


def _salt_documents(table: pa.Table, copy: int) -> pa.Table:
    """Rewrite each whitespace token ``w`` -> ``w + SALT_SEP + str(copy)``
    and recompute n_chars, keeping copies token-disjoint by construction
    (module docstring; caller asserts the separator is absent from the
    source first)."""
    suffix = SALT_SEP + str(copy)
    texts = table["text"].to_pylist()
    salted = [" ".join(w + suffix for w in t.split(" ")) for t in texts]
    n_chars = [len(t) for t in salted]
    idx_text = table.schema.get_field_index("text")
    idx_n = table.schema.get_field_index("n_chars")
    table = table.set_column(
        idx_text, table.schema.field(idx_text), pa.array(salted, pa.string())
    )
    return table.set_column(
        idx_n,
        table.schema.field(idx_n),
        pa.array(n_chars, table.schema.field(idx_n).type),
    )


def _perturb_embeddings(table: pa.Table, copy: int) -> pa.Table:
    """Seeded Gaussian perturbation of the embedding list column; the
    list layout (offsets, value type) is preserved exactly."""
    idx = table.schema.get_field_index("embedding")
    field = table.schema.field(idx)
    chunks = table["embedding"].combine_chunks()
    values = np.asarray(chunks.values.to_numpy(zero_copy_only=False))
    rng = np.random.default_rng(42 + copy)
    sigma = EMBED_NOISE_SIGMA * float(values.std())
    perturbed = (values + rng.normal(0.0, sigma, values.shape)).astype(
        values.dtype
    )
    new = pa.ListArray.from_arrays(
        chunks.offsets, pa.array(perturbed, field.type.value_type)
    ).cast(field.type)  # keep the source's list field name/nullability
    return table.set_column(idx, field, new)


def _offset_keys(
    table: pa.Table, key_cols: dict[str, str], strides: dict[str, int], copy: int
) -> pa.Table:
    for col, domain in key_cols.items():
        idx = table.schema.get_field_index(col)
        field = table.schema.field(idx)
        shifted = pc.add(table[col], copy * strides[domain])
        table = table.set_column(idx, field, shifted.cast(field.type))
    return table


def amplify(
    src: str,
    out: str,
    factor: int,
    tables: list[str] | None = None,
    overwrite: bool = False,
) -> dict:
    """Amplify ``src`` by ``factor`` into ``out``; returns the manifest.

    Idempotent: if ``out`` already holds a manifest for the same
    (src, factor, tables), the existing directory is returned untouched;
    a mismatched manifest raises unless ``overwrite=True``.
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    wanted = list(tables) if tables is not None else None
    manifest_path = os.path.join(out, "MANIFEST.json")
    params = {
        "source": os.path.abspath(src),
        "factor": factor,
        "tables": wanted or sorted(set(FACT_TABLES) | set(DIM_TABLES)),
        "salt_sep": SALT_SEP,
    }
    if os.path.exists(manifest_path):
        existing = json.load(open(manifest_path))
        if {k: existing.get(k) for k in params} == params and not overwrite:
            return existing
        same_request = {
            k: existing.get(k) for k in ("source", "factor", "tables")
        } == {k: params[k] for k in ("source", "factor", "tables")}
        if same_request:
            # same amplification request, older salt scheme: OUR version
            # bump, not a caller conflict — rebuild in place
            pass
        elif not overwrite:
            raise FileExistsError(
                f"{out} holds a different amplification "
                f"({existing.get('source')} × {existing.get('factor')}); "
                "pass overwrite=True to replace it"
            )

    os.makedirs(out, exist_ok=True)
    strides = _domain_strides(src)
    counts: dict[str, int] = {}

    for name in params["tables"]:
        src_path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(src_path):
            raise FileNotFoundError(src_path)
        base = pq.read_table(src_path)
        out_path = os.path.join(out, f"{name}.parquet")
        tmp_path = out_path + ".tmp"
        if name in DIM_TABLES:
            pq.write_table(base, tmp_path, version="2.6")
            counts[name] = base.num_rows
        else:
            key_cols = _key_columns(name)
            if name == "documents" and factor > 1:
                _assert_salt_separator_absent(base)
            writer = pq.ParquetWriter(tmp_path, base.schema, version="2.6")
            try:
                for i in range(factor):
                    t = _offset_keys(base, key_cols, strides, i)
                    if name == "documents" and i > 0:
                        t = _salt_documents(t, i)
                    if name == "embeddings" and i > 0:
                        t = _perturb_embeddings(t, i)
                    writer.write_table(t)
            finally:
                writer.close()
            counts[name] = base.num_rows * factor
        os.replace(tmp_path, out_path)

    manifest = dict(params, strides=strides, rows=counts)
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path)
    return manifest
