"""Property-based pins for the standing-index commit-log resolver
(hypothesis, no Spark): for ANY interleaving of lifecycle events —
single-index commits, multi-index transactional commits, crashed
variants of both (data staged but nothing published; intent pointers
written but the record never renamed), compactions, and crashed
compactions — ``curate._resolve_commit_log`` must agree with a plain
Python model that tracks the visible-run set directly:

- effective runs = exactly the model's (every published commit visible,
  no crashed commit visible, compaction replaces precisely the runs its
  record names, in sequence order);
- a crashed MULTI-index commit is invisible on EVERY participant — the
  atomicity invariant the r8 transaction record exists for (there is no
  event sequence in which one participant sees the run and another
  doesn't);
- ``replaced`` is exactly the union of all compaction records'
  ``replaces`` lists;
- resolution is a pure function of the directory contents (re-resolving
  is idempotent).

The unit/e2e suites pin specific crash points on the real curate path;
this layer walks the state space of event ORDERINGS, where torn-window
bugs actually live.
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

# event alphabet: (kind, n_indexes) — n_indexes > 1 exercises the txn
# path; "crashed_*" events write the pre-commit-point artifacts only
EVENTS = st.lists(
    st.sampled_from([
        ("commit", 1),
        ("commit", 2),
        ("commit", 3),
        ("crashed_data", 1),   # staged data, no marker
        ("crashed_intent", 2),  # pointers written, record never renamed
        ("crashed_intent", 3),
        ("compact", 1),
        ("crashed_compact", 1),  # staged baseline, record never renamed
    ]),
    min_size=0,
    max_size=12,
)


def _apply(tmp_path, indexes, events):
    """Drive the REAL on-disk artifacts (the same files curate and
    indexmaint write) alongside a naive model of what must be visible.
    Returns {index_dir: (model_runs, model_replaced)}."""
    seq = {"run": 0, "txn": 0, "compact": {d: 0 for d in indexes}}
    model = {d: {"runs": [], "replaced": set()} for d in indexes}
    for d in indexes:
        os.makedirs(os.path.join(d, "commits"), exist_ok=True)

    def new_run():
        seq["run"] += 1
        return f"r{seq['run']:04d}"

    for kind, n in events:
        targets = indexes[:n]
        if kind == "commit" and n == 1:
            rid = new_run()
            with open(os.path.join(targets[0], "commits", rid), "w"):
                pass
            model[targets[0]]["runs"].append(rid)
        elif kind == "commit":
            seq["txn"] += 1
            txn_id = f"t{seq['txn']:04d}"
            rids = {d: new_run() for d in targets}
            txn_path = os.path.abspath(
                os.path.join(targets[0], "commits", f"txn-{txn_id}.json")
            )
            for d in targets:
                with open(
                    os.path.join(d, "commits", f"{rids[d]}.txn"), "w"
                ) as f:
                    json.dump({"txn_file": txn_path, "txn_id": txn_id}, f)
            with open(txn_path, "w") as f:
                json.dump(
                    {"txn_id": txn_id,
                     "indexes": [
                         {"dir": os.path.abspath(d), "run_id": rids[d]}
                         for d in targets
                     ]},
                    f,
                )
            for d in targets:
                model[d]["runs"].append(rids[d])
        elif kind == "crashed_data":
            new_run()  # stray data dirs carry no commit-log entry
        elif kind == "crashed_intent":
            seq["txn"] += 1
            txn_id = f"t{seq['txn']:04d}x"
            txn_path = os.path.abspath(
                os.path.join(targets[0], "commits", f"txn-{txn_id}.json")
            )
            for d in targets:  # pointers land; the record never does
                with open(
                    os.path.join(d, "commits", f"{new_run()}.txn"), "w"
                ) as f:
                    json.dump({"txn_file": txn_path, "txn_id": txn_id}, f)
        elif kind in ("compact", "crashed_compact"):
            d = targets[0]
            visible = list(model[d]["runs"])
            if len(visible) <= 1:
                continue  # the real operator is a no-op below two runs
            baseline = new_run()
            if kind == "crashed_compact":
                continue  # staged baseline only — nothing published
            seq["compact"][d] += 1
            name = f"compact-{seq['compact'][d]:08d}-{baseline}.json"
            with open(os.path.join(d, "commits", name), "w") as f:
                json.dump({"baseline": baseline, "replaces": visible}, f)
            model[d]["runs"] = [baseline]
            model[d]["replaced"] |= set(visible)
    return model


@settings(max_examples=120, deadline=None)
@given(events=EVENTS, data=st.data())
def test_resolver_matches_model(events, data, tmp_path_factory):
    from yelp_recommender_spark.curate import _resolve_commit_log

    base = tmp_path_factory.mktemp("cl")
    indexes = [str(base / f"idx{i}") for i in range(3)]
    model = _apply(base, indexes, events)
    for d in indexes:
        commits = os.path.join(d, "commits")
        runs, replaced = _resolve_commit_log(commits)
        # loaders consume the run set (each run's paths are read as one
        # union) — order is presentation, membership is the contract
        assert len(runs) == len(set(runs)), "duplicate effective run"
        assert set(runs) == set(model[d]["runs"]), (d, events)
        assert replaced == model[d]["replaced"], (d, events)
        # idempotent: resolution is a pure function of the directory
        assert (runs, replaced) == _resolve_commit_log(commits)


@settings(max_examples=60, deadline=None)
@given(events=EVENTS)
def test_crashed_multi_commit_invisible_everywhere(events, tmp_path_factory):
    """Atomicity across participants: after any event sequence, every
    multi-index transaction is either COMMITTED on all its participants
    or on none — never split. Committed means effective-or-superseded:
    a later compaction may retire a participant's run on one index
    while the peer's stays effective, which is supersession, not a torn
    commit."""
    from yelp_recommender_spark.curate import _resolve_commit_log

    base = tmp_path_factory.mktemp("at")
    indexes = [str(base / f"idx{i}") for i in range(3)]
    _apply(base, indexes, events)
    by_txn: dict[str, list[bool]] = {}
    for d in indexes:
        commits = os.path.join(d, "commits")
        runs, replaced = _resolve_commit_log(commits)
        committed = set(runs) | replaced
        for e in os.listdir(commits):
            if not e.endswith(".txn"):
                continue
            with open(os.path.join(commits, e)) as f:
                ptr = json.load(f)
            rid = e[: -len(".txn")]
            by_txn.setdefault(ptr["txn_id"], []).append(rid in committed)
    for txn_id, vis in by_txn.items():
        assert len(set(vis)) == 1, f"txn {txn_id} split-committed: {vis}"
