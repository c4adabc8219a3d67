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


def _fake_repo(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    monkeypatch.setattr(bench, "_RESOLVED", {})
    os.makedirs(tmp_path / "BENCH", exist_ok=True)


def test_run_suffix_is_fresh_then_r5b_convention(tmp_path, monkeypatch):
    _fake_repo(tmp_path, monkeypatch)
    tag = bench.ROUND_TAG
    # fresh round → no suffix
    assert bench._run_artifact("SWEEP").endswith(f"SWEEP_{tag}.json")
    # a second run in the same round suffixes with 'b' (the hand-made
    # escape hatch in r5 was SWEEP_r5b.json — same shape, so history
    # scans pick it up), never overwriting the first run's evidence
    p = tmp_path / "BENCH" / f"SWEEP_{tag}.json"
    p.write_text("{}")
    monkeypatch.setattr(bench, "_RESOLVED", {})
    assert bench._run_artifact("SWEEP").endswith(f"SWEEP_{tag}b.json")
    assert os.path.exists(p)


def test_run_suffix_is_shared_across_artifact_kinds(tmp_path, monkeypatch):
    """Round-6 advice: after an uneven prior run (only SWEEP_rNb exists),
    per-kind resolution emitted mismatched suffixes (SWEEP_rNc next to
    HEADLINE_rNb). The suffix is now resolved once over the union of
    kinds, so every artifact of one run correlates by filename."""
    _fake_repo(tmp_path, monkeypatch)
    tag = bench.ROUND_TAG
    # uneven prior state: only a SWEEP from an earlier run this round
    (tmp_path / "BENCH" / f"SWEEP_{tag}.json").write_text("{}")
    sweep = bench._run_artifact("SWEEP")
    headline = bench._run_artifact("HEADLINE")
    plans = bench._run_artifact("PLANS")
    assert sweep.endswith(f"SWEEP_{tag}b.json")
    assert headline.endswith(f"HEADLINE_{tag}b.json")
    assert plans.endswith(f"PLANS_{tag}b.json")


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


def test_stdout_line_fits_driver_tail_capture(monkeypatch):
    """Round-6 judge item #1: every BENCH_r{3..6}.json had "parsed": null
    because the stdout JSON line exceeded the driver's ~2000-char tail
    capture. Rebuild a line from a FULL representative state (worst-case
    realistic extras, mirroring the r6c artifact) and assert it fits AND
    round-trips with the gate fields intact."""
    state = {
        "timings": {f"q{i:02d}": 0.123 for i in range(49)},
        "total": 29.185,
        "sf": 0.1,
        "emitted": False,
        "queries_file": "BENCH/HEADLINE_r7.json",
        "extras": {
            "headline": {
                "protocol": "1 warm + 3 timed reps/query, median; "
                "full protocol in the reps file",
                "total_median_of_3": 29.185,
                "total_best_of_3": 28.147,
                "warm_over_rep_median_ratio": 1.29,
                "per_query_reps_file": "BENCH/HEADLINE_r7.json",
            },
            "plan_fingerprints": "BENCH/PLANS_r7.json",
            "scaling": {
                "protocol": "v2c paired interleaved sweep, 9 file + 3 "
                "gen pairs; see BENCH/BASELINE.md",
                "pages_rows": 24000000,
                "n": 4,
                "n4": 16,
                "local4_median_pages_per_sec": 273569.6,
                "local16_median_pages_per_sec": 988338.5,
                "efficiency_n_to_4n_paired_median": 0.914,
                "gen_efficiency_n_to_4n_paired_median": 0.912,
                "criterion_met_file": True,
                "criterion_met_gen": True,
                # worst realistic case: base 5 + replacement cap 4 pairs
                "pair_efficiencies": [0.91, 0.914, 0.882, 0.933, 0.939,
                                      0.901, 0.87, 0.925, 0.94],
                "gen_pair_efficiencies": [0.912, 0.91, 0.929],
                "pair_steal_pct": [0.01, 0.0, 0.0, 0.0, 0.0,
                                   1.52, 2.31, 0.05, 0.0],
                "efficiency_low_steal": 0.914,
                "low_steal_pairs": 7,
                "partial": False,
                "stop_reason": "early-stop: running median stable at "
                "0.914 after 5 pairs",
                "skew": {"median_speedup": 2.215,
                         "pair_speedups": [2.398, 2.032],
                         "plain_sec": [12.47, 12.78],
                         "salted_sec": [5.2, 6.29]},
                "scan_decomposition": {"median_efficiency": 0.749,
                                       "pair_efficiencies": [0.77, 0.728]},
            },
            "sweep": {"n": 4, "n4": 16, "rows": 24000000,
                      "file_efficiency": 0.914, "file_best_efficiency": 0.939,
                      "gen_efficiency": 0.912, "gen_best_efficiency": 0.929,
                      "tag": "r7", "artifact": "BENCH/SWEEP_r7.json"},
        },
    }
    monkeypatch.setattr(bench, "STATE", state)
    line = bench.render_stdout_line(bench.build_stdout_payload())
    assert len(line) < bench.STDOUT_LINE_LIMIT
    parsed = json.loads(line)
    # the driver's gate fields must survive in the parsed line
    assert parsed["extras"]["scaling"]["criterion_met_file"] is True
    assert parsed["extras"]["scaling"]["efficiency_n_to_4n_paired_median"] == 0.914
    assert parsed["queries"] == {}  # per-query map lives in queries_file
    assert parsed["queries_file"] == "BENCH/HEADLINE_r7.json"
    # nothing needed trimming on the representative payload
    assert "trimmed_for_size" not in parsed["extras"]


def test_stdout_line_trims_gracefully_when_oversized(monkeypatch):
    """Defensive path: if extras ever balloon (e.g. a long scaling_error
    plus maximal pair arrays), the renderer drops documented keys in
    order rather than emitting an unparseable >limit line."""
    monkeypatch.setitem(bench.STATE, "extras", {
        "scaling": {
            "criterion_met_file": True,
            "efficiency_n_to_4n_paired_median": 0.9,
            "pair_efficiencies": [0.9] * 200,
            "pair_steal_pct": [0.0] * 200,
            "gen_pair_efficiencies": [0.9] * 200,
            "skew": {"median_speedup": 2.0, "pair_speedups": [2.0] * 100},
            "scan_decomposition": {"median_efficiency": 0.75},
        },
    })
    monkeypatch.setitem(bench.STATE, "queries_file", None)
    line = bench.render_stdout_line(bench.build_stdout_payload())
    assert len(line) <= bench.STDOUT_LINE_LIMIT
    parsed = json.loads(line)
    assert parsed["extras"]["scaling"]["criterion_met_file"] is True
    assert parsed["extras"]["trimmed_for_size"]


def test_sweep_history_orders_by_round_then_suffix_on_equal_mtime(
    tmp_path, monkeypatch
):
    """The round checkout resets committed mtimes to one timestamp, so
    history ordering must fall back to the tag: r10 > r9 > r6c > r6a."""
    _fake_repo(tmp_path, monkeypatch)
    t = None
    for name in ("SWEEP_r6a.json", "SWEEP_r10.json", "SWEEP_r6c.json",
                 "SWEEP_r9.json"):
        p = tmp_path / "BENCH" / name
        p.write_text("{}")
        if t is None:
            t = os.path.getmtime(p)
        os.utime(p, (t, t))
    names = [os.path.basename(x) for x in bench._sweep_history_paths()]
    assert names == ["SWEEP_r10.json", "SWEEP_r9.json",
                     "SWEEP_r6c.json", "SWEEP_r6a.json"]


def test_headline_artifact_written_incrementally_and_kill_safe(
    tmp_path, monkeypatch
):
    """r7 code-review finding: moving the per-query map off the stdout
    line made the HEADLINE side file the ONLY durable home of the
    per-query evidence — so it must be (re)written after every query,
    partial-flagged, with totals-so-far in STATE for the signal
    handler's emit path. A kill mid-headline then still yields a valid
    artifact instead of value=0.0 / queries_file=null."""
    _fake_repo(tmp_path, monkeypatch)
    monkeypatch.setattr(
        bench, "STATE",
        {"timings": {}, "total": 0.0, "extras": {}, "sf": 0.1,
         "emitted": False},
    )
    reps = {"q1": {"warm": 1.2, "timed": [1.0, 1.1, 1.0], "steal_pct": 0.0}}
    bench._write_headline_artifact({"q1": 1.0}, reps, partial=True)

    path = bench._run_artifact("HEADLINE")
    with open(path) as fh:
        on_disk = json.load(fh)
    assert on_disk["partial"] is True
    assert on_disk["medians"] == {"q1": 1.0}
    assert bench.STATE["queries_file"] == os.path.relpath(path, str(tmp_path))
    assert bench.STATE["extras"]["headline"]["partial"] is True
    assert bench.STATE["extras"]["headline"]["total_median_of_3"] == 1.0
    # the handler's emit path surfaces the evidence-so-far
    payload = bench.build_stdout_payload()
    assert payload["queries_file"] == bench.STATE["queries_file"]

    # second query lands; final rewrite clears the partial flag
    reps["q2"] = {"warm": 0.5, "timed": [0.4, 0.4, 0.4], "steal_pct": 0.0}
    bench._write_headline_artifact({"q1": 1.0, "q2": 0.4}, reps,
                                   partial=False)
    with open(path) as fh:
        final = json.load(fh)
    assert "partial" not in final
    assert final["medians"] == {"q1": 1.0, "q2": 0.4}
    assert "partial" not in bench.STATE["extras"]["headline"]
    assert not os.path.exists(path + ".tmp")
