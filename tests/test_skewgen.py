"""plant_skew unit pins (the opt-in sf1 harness exercises it at scale;
these cover the failure modes the r6 code review surfaced): relative
source paths must not produce dangling symlinks, a typo'd table must
not silently emit a no-skew twin, and the manifest idempotency/refusal
contract."""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from yelp_recommender_spark.skewgen import plant_skew

SRC = "/root/testdata/sf0.001"


def test_plant_skew_basic_and_idempotent(tmp_path):
    out = str(tmp_path / "skew")
    m = plant_skew(SRC, out, every=10)
    assert m["hot_value"] == 0 and m["rows"] > 0
    con = duckdb.connect()
    top = con.execute(
        f"SELECT user_id, count(*) FROM read_parquet('{out}/events.parquet')"
        " GROUP BY 1 ORDER BY 2 DESC LIMIT 1"
    ).fetchone()
    assert top[0] == 0 and top[1] >= m["rows"] // 10
    # idempotent: same params return the manifest untouched
    before = os.path.getmtime(out + "/events.parquet")
    assert plant_skew(SRC, out, every=10) == m
    assert os.path.getmtime(out + "/events.parquet") == before
    with pytest.raises(FileExistsError):
        plant_skew(SRC, out, every=5)


def test_plant_skew_relative_src_symlinks_resolve(tmp_path, monkeypatch):
    """A RELATIVE src must still produce working symlinks: raw relative
    targets would resolve against the link's own directory and dangle
    (code-review r6)."""
    monkeypatch.chdir("/root")
    out = str(tmp_path / "skew_rel")
    plant_skew("testdata/sf0.001", out, every=10)
    link = os.path.join(out, "customer.parquet")
    assert os.path.islink(link)
    assert os.path.isabs(os.readlink(link))
    assert os.path.exists(link)  # resolves from anywhere
    monkeypatch.chdir(str(tmp_path))
    assert os.path.exists(link)


def test_plant_skew_missing_table_raises_before_any_write(tmp_path):
    with pytest.raises(ValueError, match="not found"):
        plant_skew(SRC, str(tmp_path / "x"), table="event")  # typo
    # validation precedes every write: no dir, no links, no manifest —
    # a later retry can never adopt leftovers from the failed run
    assert not os.path.exists(str(tmp_path / "x"))


def test_plant_skew_replaces_stale_links_never_adopts(tmp_path):
    """A pre-existing symlink pointing elsewhere (stale run, different
    src, dangling target) is replaced; a regular file is refused —
    silent adoption would build a mixed-source twin under a clean
    manifest (code-review r6)."""
    out = tmp_path / "skew"
    out.mkdir()
    os.symlink("/nonexistent/customer.parquet", out / "customer.parquet")
    (out / "nation.parquet").write_text("not a link")
    with pytest.raises(FileExistsError, match="not a managed symlink"):
        plant_skew(SRC, str(out))
    os.remove(out / "nation.parquet")
    plant_skew(SRC, str(out))
    assert os.readlink(out / "customer.parquet") == os.path.abspath(
        os.path.join(SRC, "customer.parquet")
    )
    assert os.path.exists(out / "customer.parquet")


def test_plant_skew_invalid_every_rejected_before_any_write(tmp_path):
    """ADVICE r6: every=0 used to blow up mid-write (slice step 0) after
    symlinks existed, and every<0 silently whaled EVERY row (negative
    step flips the whole mask) with a negative hot_rows_min in the
    manifest — both must be rejected up front, before makedirs."""
    out = tmp_path / "bad"
    for every in (0, -1, 2.5):
        with pytest.raises(ValueError, match="every must be"):
            plant_skew(SRC, str(out), every=every)
        assert not out.exists()  # nothing was created
