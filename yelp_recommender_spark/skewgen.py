"""Skew planter: derive a POWER-LAW-KEYED variant of a scale directory
so skew handling can be MEASURED at scale, not argued (VERDICT r5 #8).

The amplifier (:mod:`yelp_recommender_spark.amplify`) is deliberately
FK-consistent and roughly uniform — good for linear-growth measurement,
blind to the production failure mode where one whale key owns a double-
digit share of a table. ``plant_skew`` rewrites a deterministic fraction
of one table's key column to a single hot value (default: every 10th
``events`` row becomes the minimum ``user_id`` — one user with 10% of
all events), leaving every other byte of the directory untouched (other
tables are symlinked, not copied). Oracle parity is NOT a goal of the
skewed variant: it exists to time window/sessionization, aggregation,
and join plans under a hot key, next to the uniform twin.

Deterministic by construction (row position, no RNG) and idempotent via
a manifest, like the amplifier.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from yelp_recommender_spark.amplify import DIM_TABLES, FACT_TABLES


def plant_skew(
    src: str,
    out: str,
    table: str = "events",
    key: str = "user_id",
    every: int = 10,
) -> dict:
    """Write a skewed twin of ``src`` into ``out``: in ``table``, every
    ``every``-th row's ``key`` becomes the column's minimum value (the
    whale — 1/every of the table's rows on one key, on top of whatever
    the key already owned). All other tables are symlinked. Returns the
    manifest; idempotent for identical parameters."""
    params = {
        "source": os.path.abspath(src),
        "table": table,
        "key": key,
        "every": every,
    }
    manifest_path = os.path.join(out, "MANIFEST_SKEW.json")
    if os.path.exists(manifest_path):
        existing = json.load(open(manifest_path))
        if {k: existing.get(k) for k in params} == params:
            return existing
        raise FileExistsError(
            f"{out} holds a different skew plant ({existing}); remove it"
        )
    # validate BEFORE any filesystem write: a typo'd table must not
    # leave behind symlinks a later retry (with a different src) would
    # silently adopt into a mixed-source twin; every<1 would either
    # blow up mid-write (slice step 0) or silently whale EVERY row
    # (negative step flips the whole mask) with a nonsense manifest
    if not isinstance(every, int) or every < 1:
        raise ValueError(
            f"plant_skew: every must be an int >= 1, got {every!r}"
        )
    if table not in FACT_TABLES + DIM_TABLES or not os.path.exists(
        os.path.join(src, f"{table}.parquet")
    ):
        raise ValueError(
            f"plant_skew: table {table!r} not found in {src} — nothing "
            "would be skewed"
        )
    os.makedirs(out, exist_ok=True)
    for name in FACT_TABLES + DIM_TABLES:
        src_path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(src_path):
            continue
        dst = os.path.join(out, f"{name}.parquet")
        if name != table:
            # absolute target: a relative path would resolve relative
            # to the LINK's directory and dangle; an existing link is
            # adopted ONLY if it already points at this exact source —
            # anything else (stale run, different src, dangling link)
            # is replaced, never trusted
            target = os.path.abspath(src_path)
            if os.path.lexists(dst):
                if os.path.islink(dst) and os.readlink(dst) == target:
                    continue
                if not os.path.islink(dst):
                    raise FileExistsError(
                        f"plant_skew: {dst} exists and is not a managed "
                        "symlink — refusing to replace it"
                    )
                os.remove(dst)
            os.symlink(target, dst)
            continue
        import numpy as np

        t = pq.read_table(src_path)
        idx = t.schema.get_field_index(key)
        field = t.schema.field(idx)
        col = t[key].combine_chunks()
        hot = pa.scalar(pc.min(col).as_py(), field.type)
        mask_np = np.zeros(t.num_rows, dtype=bool)
        mask_np[::every] = True
        newcol = pc.if_else(pa.array(mask_np), hot, col)
        t = t.set_column(idx, field, newcol.cast(field.type))
        tmp = dst + ".tmp"
        pq.write_table(t, tmp, version="2.6")
        os.replace(tmp, dst)
        params["hot_value"] = hot.as_py()
        params["hot_rows_min"] = int(-(-t.num_rows // every))
        params["rows"] = t.num_rows
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(params, f, indent=1)
    os.replace(tmp, manifest_path)
    return params
