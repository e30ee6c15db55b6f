"""Unit tests for the measurement scripts' pure helpers.

scripts/shuffle_audit.py reads Spark's monitoring REST API and
attributes per-stage metrics to the query that ran between two
snapshots; the attribution arithmetic (sum_new_stages) is REST-free on
purpose so its rules are pinned here: only COMPLETE stages count, a
stage is counted once per (stageId, attemptId) — a retried attempt
re-executed its tasks and its bytes genuinely moved — and the seen-set
threading makes successive deltas disjoint.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from shuffle_audit import FIELDS, sum_new_stages  # noqa: E402


def _stage(sid, attempt=0, status="COMPLETE", **metrics):
    s = {"stageId": sid, "attemptId": attempt, "status": status}
    s.update(dict.fromkeys(FIELDS, 0))
    s.update(metrics)
    return s


def test_sums_only_new_complete_stages():
    stages = [
        _stage(1, shuffleWriteBytes=100, inputBytes=7),
        _stage(2, shuffleWriteBytes=30),
        _stage(3, status="ACTIVE", shuffleWriteBytes=999),
    ]
    totals, seen = sum_new_stages(stages, set())
    assert totals["shuffleWriteBytes"] == 130
    assert totals["inputBytes"] == 7
    assert (1, 0) in seen and (2, 0) in seen
    # the ACTIVE stage is neither summed nor marked seen — it will be
    # counted once it completes
    assert (3, 0) not in seen


def test_seen_threading_makes_deltas_disjoint():
    first = [_stage(1, shuffleWriteBytes=100)]
    totals, seen = sum_new_stages(first, set())
    assert totals["shuffleWriteBytes"] == 100
    both = first + [_stage(2, shuffleWriteBytes=40)]
    totals2, seen2 = sum_new_stages(both, seen)
    assert totals2["shuffleWriteBytes"] == 40
    assert seen2 == {(1, 0), (2, 0)}


def test_retried_attempt_counts_separately():
    stages = [
        _stage(5, attempt=0, shuffleWriteBytes=100),
        _stage(5, attempt=1, shuffleWriteBytes=100),
    ]
    totals, _ = sum_new_stages(stages, set())
    assert totals["shuffleWriteBytes"] == 200


def test_missing_metric_fields_default_to_zero():
    stages = [{"stageId": 9, "status": "COMPLETE"}]
    totals, seen = sum_new_stages(stages, set())
    assert totals == dict.fromkeys(FIELDS, 0)
    assert seen == {(9, 0)}


# ---------------------------------------------------------- skew_audit

from skew_audit import dominant_stage, skew_ratios  # noqa: E402


def test_dominant_stage_picks_biggest_new_shuffle_reader():
    stages = [
        _stage(1, shuffleReadBytes=100),
        _stage(2, shuffleReadBytes=500),
        _stage(3, shuffleReadBytes=900),  # seen: excluded
        _stage(4, status="ACTIVE", shuffleReadBytes=999),
    ]
    dom = dominant_stage(stages, {(3, 0)})
    assert dom["stageId"] == 2


def test_dominant_stage_none_when_fully_broadcast():
    # a plan with no exchange consumer (all-broadcast joins, no agg)
    stages = [_stage(1, shuffleReadBytes=0), _stage(2, shuffleReadBytes=0)]
    assert dominant_stage(stages, set()) is None


def test_skew_ratios_reduce_quantiles():
    summary = {
        "executorRunTime": [1.0, 10.0, 200.0],  # quantiles 0 / 0.5 / 1.0
        "shuffleReadMetrics": {
            "readBytes": [0.0, 1000.0, 46000.0],
        },
    }
    r = skew_ratios(summary)
    assert r["task_time_max_over_med"] == 20.0
    assert r["task_read_max_over_med"] == 46.0
    assert r["task_read_max_bytes"] == 46000


def test_skew_ratios_zero_median_yields_none():
    summary = {"executorRunTime": [0.0, 0.0, 5.0]}
    r = skew_ratios(summary)
    assert r["task_time_max_over_med"] is None
    assert r["task_read_max_over_med"] is None


def test_shuffle_audit_end_to_end_against_live_rest_api():
    """Integration pin for the REST-metrics pipeline (the pure helpers
    above can't catch the monitoring API renaming a field or the UI
    port handshake breaking on a Spark upgrade): run the audit script
    as a subprocess — it needs its own SparkContext with the UI
    enabled, which the suite's session fixture deliberately disables —
    on the smallest fixture and assert the JSON contract: metrics
    present, shuffle bytes nonzero (q177's detection always
    exchanges), write <= read-side accounting coherent."""
    import json as _json
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001", SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "shuffle_audit.py"),
         "--engine-only", "--queries", "q177_exact_substring_dedup"],
        capture_output=True, text=True, timeout=300, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = next(
        ln for ln in out.stdout.splitlines() if ln.startswith('{"metric": "shuffle_audit"')
    )
    rec = _json.loads(line)["results"]["q177_exact_substring_dedup"]["engine"]
    assert rec["shuffleWriteBytes"] > 0
    assert rec["shuffleWriteRecords"] > 0
    assert rec["shuffleReadBytes"] >= rec["shuffleWriteBytes"]
    assert rec["wall_s"] > 0
