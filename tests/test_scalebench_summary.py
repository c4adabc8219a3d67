"""Unit guards for the sweep summary math (tools/scalebench.py).

The scaling criterion is computed by `_summarize`; it became load-bearing
protocol code in r5 (incremental artifacts, partial summaries, steal
subset) — these tests pin its semantics without any Spark session.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scalebench import _pair_steal, _summarize  # noqa: E402


def _host(steals_n4, steals_n):
    return {
        "file16": [{"steal_pct": s, "jvm_util": 1.0, "host_busy_pct": 50}
                   for s in steals_n4],
        "file4": [{"steal_pct": s, "jvm_util": 1.0, "host_busy_pct": 50}
                  for s in steals_n],
    }


def test_criterion_is_median_of_paired_efficiencies():
    results = {"file4": [100.0, 100.0, 100.0],
               "file16": [320.0, 360.0, 400.0]}  # pairs 0.8, 0.9, 1.0
    s = _summarize(results, _host([0, 0, 0], [0, 0, 0]), 1000, 4, 16)
    assert s["file_pair_efficiencies"] == [0.8, 0.9, 1.0]
    assert s["file_efficiency"] == 0.9
    assert s["file_best_efficiency"] == 1.0
    assert s["reps"] == 3


def test_partial_summary_with_zero_gen_pairs_is_valid():
    results = {"file4": [100.0], "file16": [320.0]}
    s = _summarize(results, _host([0], [0]), 1000, 4, 16)
    assert s["file_efficiency"] == 0.8
    assert s["gen_reps"] == 0
    assert s["gen_efficiency"] is None
    assert s["gen_pair_efficiencies"] == []


def test_unmatched_trailing_run_is_not_paired():
    # a kill between the 4N and N runs of a pair leaves an odd run —
    # it must not contribute a pair
    results = {"file4": [100.0], "file16": [320.0, 500.0]}
    s = _summarize(results, _host([0, 0], [0]), 1000, 4, 16)
    assert s["file_pair_efficiencies"] == [0.8]
    assert s["file_reps"] == 1


def test_low_steal_subset_is_covariate_based_and_gate_unchanged():
    results = {"file4": [100.0, 100.0, 100.0],
               "file16": [320.0, 360.0, 200.0]}  # pairs 0.8, 0.9, 0.5
    # the worst pair (0.5) has 4.9% steal on its 4N run; the gate median
    # still INCLUDES it (no outcome-based exclusion), the subset excludes
    s = _summarize(results, _host([0.1, 0.2, 4.9], [0.1, 0.1, 0.1]),
                   1000, 4, 16)
    assert s["file_efficiency"] == 0.8  # all pairs: median(0.8,0.9,0.5)
    assert s["file_low_steal_pairs"] == 2
    assert s["file_efficiency_low_steal"] == 0.85
    assert s["file_pair_steal_pct"] == [0.1, 0.2, 4.9]


def test_pair_steal_takes_max_of_both_sizes():
    host = _host([0.3, 2.0], [1.5, 0.1])
    assert _pair_steal(host, "file", 4, 16, 0) == 1.5
    assert _pair_steal(host, "file", 4, 16, 1) == 2.0
    assert _pair_steal(host, "file", 4, 16, 9) == 0.0  # out of range


def test_gen_reserve_gates_second_and_later_replacements():
    """r6 budget rule: base pairs and the first replacement need only the
    pair itself; replacement #2+ must also leave room for 2 gen pairs."""
    from tools.scalebench import _pair_budget_need

    est = 300.0
    base = 5
    plain = est * 1.1
    reserved = plain + 2 * est * 1.3
    for rep in range(base):  # base pairs: no reserve
        assert _pair_budget_need(rep, base, est) == plain
    assert _pair_budget_need(base, base, est) == plain  # 1st replacement
    assert _pair_budget_need(base + 1, base, est) == reserved
    assert _pair_budget_need(base + 3, base, est) == reserved
