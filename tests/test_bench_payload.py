"""bench.py artifact schema: the stall-aware fields (VERDICT r5 #4) and
the partial-write labeling (ADVICE r5) — a min-of-N record inflated by a
host stall must be machine-distinguishable from a clean one, and a crash
mid-pass-2 must leave an artifact whose labels match what the numbers
actually are (min-of-two for the re-run prefix under a completed-passes
``repeat`` of 1, attributed via ``in_progress_pass``)."""

from __future__ import annotations

import bench


def test_single_pass_payload_has_no_repeat_fields():
    out = bench._payload({"q1": 1.0, "q2": 2.0}, completed_passes=1)
    assert out["value"] == 3.0
    for k in ("repeat", "passes", "max_pass_delta", "host_stall_suspect",
              "in_progress_pass", "partial"):
        assert k not in out


def test_multi_pass_payload_flags_stall():
    pt = {"q1": [1.0, 1.1], "q2": [40.2, 3.6]}  # the r5 q88 stall shape
    out = bench._payload(
        {"q1": 1.0, "q2": 3.6}, completed_passes=2, pass_times=pt
    )
    assert out["repeat"] == 2
    assert out["passes"]["q2"] == [40.2, 3.6]
    assert abs(out["max_pass_delta"] - 36.6) < 1e-9
    assert out["host_stall_suspect"] is True


def test_multi_pass_payload_clean_run_not_suspect():
    pt = {"q1": [1.0, 1.2], "q2": [3.0, 2.8]}
    out = bench._payload(
        {"q1": 1.0, "q2": 2.8}, completed_passes=2, pass_times=pt
    )
    assert out["host_stall_suspect"] is False
    assert out["max_pass_delta"] <= bench.STALL_DELTA_S


def test_partial_mid_second_pass_is_attributed():
    # crash after q1 was re-measured in pass 2: repeat stays at the
    # COMPLETED pass count, the in-flight pass is recorded, and q1's two
    # measurements are visible in passes
    pt = {"q1": [5.0, 1.0], "q2": [2.0]}
    out = bench._payload(
        {"q1": 1.0, "q2": 2.0}, completed_passes=1, partial=True,
        pass_times=pt, in_progress_pass=2,
    )
    assert "repeat" not in out  # only one pass completed
    assert out["in_progress_pass"] == 2
    assert out["partial"] is True
    assert out["passes"]["q1"] == [5.0, 1.0]
    assert out["passes"]["q2"] == [2.0]
