"""Unit guards for bench.py's artifact plumbing (round-5 judge item #3 +
r5 advice): a second bench run in the same round must never overwrite the
first run's evidence, and a pre-existing sweep artifact must never be
ingested as THIS run's extras.scaling.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_versioned_artifact_leaves_existing_files_alone(tmp_path):
    p = str(tmp_path / "SWEEP_r6.json")
    assert bench._versioned_artifact(p) == p  # fresh → unchanged
    open(p, "w").write("{}")
    p2 = bench._versioned_artifact(p)
    assert p2 == str(tmp_path / "SWEEP_r6b.json")
    open(p2, "w").write("{}")
    assert bench._versioned_artifact(p) == str(tmp_path / "SWEEP_r6c.json")
    # both artifacts still on disk, untouched
    assert os.path.exists(p) and os.path.exists(p2)


def test_versioned_artifact_matches_the_r5b_convention(tmp_path):
    # the hand-made escape hatch in r5 was SWEEP_r5b.json — the automatic
    # suffixing must produce the same shape so history scans pick it up
    p = str(tmp_path / "HEADLINE_r9.json")
    open(p, "w").write("{}")
    assert bench._versioned_artifact(p).endswith("HEADLINE_r9b.json")


def test_stale_sweep_artifact_is_not_ingested_as_this_run(tmp_path, monkeypatch):
    """A sweep file whose mtime predates BENCH_T0 is prior-round history:
    extras.scaling must stay empty and scaling_error must say why."""
    p = str(tmp_path / "SWEEP_r6.json")
    with open(p, "w") as fh:
        json.dump({"file_efficiency": 0.95, "n": 4, "n4": 16}, fh)
    old = os.path.getmtime(p)
    os.utime(p, (old - 3600, old - 3600))
    monkeypatch.setitem(bench._RESOLVED, "SWEEP", p)
    monkeypatch.setitem(bench.STATE, "extras", {})
    bench._scaling_extras_from_sweep()
    assert "scaling" not in bench.STATE["extras"]
    assert "predates this run" in bench.STATE["extras"]["scaling_error"]


def test_fresh_sweep_artifact_is_ingested(tmp_path, monkeypatch):
    p = str(tmp_path / "SWEEP_r6.json")
    with open(p, "w") as fh:
        json.dump(
            {"file_efficiency": 0.85, "n": 4, "n4": 16, "reps": 5,
             "file_median_4": 100.0, "file_median_16": 340.0,
             "file_pair_efficiencies": [0.85], "gen_pair_efficiencies": [],
             "partial": False, "stop_reason": None}, fh,
        )
    monkeypatch.setitem(bench._RESOLVED, "SWEEP", p)
    monkeypatch.setitem(bench.STATE, "extras", {})
    bench._scaling_extras_from_sweep()
    sc = bench.STATE["extras"]["scaling"]
    assert sc["criterion_met_file"] is True
    assert sc["efficiency_n_to_4n_paired_median"] == 0.85


def test_history_label_marks_only_the_newest_same_round_sweep_current():
    """Auto-suffixed same-round sweeps (SWEEP_r6.json, SWEEP_r6b.json, …)
    must not all render as "current round" in BASELINE.md — that produced
    duplicate section headers in the r6b working tree. Only the newest
    unstoried tag is current; siblings keep their tag."""
    tag_new = bench.ROUND_TAG + "zz"  # never in _HISTORY_LABELS
    tag_old = bench.ROUND_TAG + "zy"
    assert bench._history_label(tag_new, False) == "current round"
    assert (
        bench._history_label(tag_old, True)
        == f"{tag_old} — earlier window this round"
    )
    # storied tags always keep their story, newest or not
    assert bench._history_label("r4", False) == "round 4"
    # prior-round unstoried tags fall through to the bare tag
    assert bench._history_label("r0x", False) == "r0x"
