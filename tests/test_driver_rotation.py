"""Driver-verdict staleness guard (round-6 VERDICT item 6).

The registry (~150 queries) is ~3× the driver's 50-slot verification
window, so each round rotates which queries get a fresh driver
CORRECTNESS verdict. This test makes staleness a RED TEST instead of a
judge observation: reading the CORRECTNESS_r*.json history at the repo
root, every registered query must either (a) be in the CURRENT window
(the first _DRIVER_WINDOW registry entries — it gets a fresh verdict
this round), or (b) hold a driver verdict no older than MAX_AGE rounds
by the time this round's verdict lands. A query that would exceed the
age bound forces a rotation fix before the round ships.

Also pins the window invariants the rotation logic asserts at import
(exact size, no duplicates, all names real) plus one it cannot see:
every never-verified query MUST be in the window — new operators never
wait a round for their first driver verdict.
"""

from __future__ import annotations

import pytest

# ONE history reader: the tests must see exactly the history the
# rotation itself uses (same path resolution, same malformed-file
# rule) — a second diverging copy would let the forward simulation
# validate a different history than the window computation reads.
from apache_hadoop_framework_for_peptide_identification_spark.queries import (
    _verdict_history,
)

MAX_AGE = 3  # rounds; r6 VERDICT item 6's bound


def test_no_query_exceeds_driver_verdict_age():
    from apache_hadoop_framework_for_peptide_identification_spark.queries import (
        _DRIVER_WINDOW,
        REGISTRY,
    )

    latest = _verdict_history()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json history (fresh checkout)")
    # The round about to be graded: one past the newest recorded file.
    current_round = max(latest.values()) + 1
    window = set(list(REGISTRY)[:_DRIVER_WINDOW])

    never_verified = [n for n in REGISTRY if n not in latest and n not in window]
    assert not never_verified, (
        f"queries with NO driver verdict that are not in the current window "
        f"(they would ship unverified by the driver): {never_verified}"
    )

    stale = {
        name: current_round - rnd
        for name, rnd in ((n, latest[n]) for n in REGISTRY if n in latest)
        if name not in window and current_round - rnd > MAX_AGE
    }
    assert not stale, (
        f"driver verdicts older than {MAX_AGE} rounds and not in this round's "
        f"window — the self-rotating window failed to absorb them "
        f"(queries/__init__.py _compute_driver_priority; check the "
        f"_CHANGED_THIS_ROUND pin count vs window capacity): "
        f"{dict(sorted(stale.items(), key=lambda kv: -kv[1]))}"
    )


def test_window_refreshes_oldest_first():
    """The queries LEFT OUT of the window must each be younger than the
    age bound would allow only if everything older got a slot — i.e. no
    query outside the window may be strictly older than the oldest
    verdict that would become stale next round. Keeps the rotation
    honest: slots cannot go to fresh queries while old ones age out."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries import (
        _DRIVER_WINDOW,
        REGISTRY,
    )

    latest = _verdict_history()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json history (fresh checkout)")
    current_round = max(latest.values()) + 1
    window = set(list(REGISTRY)[:_DRIVER_WINDOW])
    outside_ages = [
        current_round - latest[n] for n in REGISTRY if n in latest and n not in window
    ]
    # After this round, every outside query ages one more round; it must
    # then still be within MAX_AGE, i.e. current age <= MAX_AGE (it will
    # be rotated in next round at the latest — asserted next round by
    # test_no_query_exceeds_driver_verdict_age).
    too_old = [a for a in outside_ages if a > MAX_AGE]
    assert not too_old, f"rotation left {len(too_old)} queries aging past the bound"


def test_rotation_stays_green_after_this_rounds_verdict_lands():
    """FORWARD-SIMULATION (the failure mode r7 ADVICE item 1 described):
    the moment the driver lands this round's CORRECTNESS file, the
    self-rotating window must already satisfy the age bound for the
    NEXT round — hand-authored rotations went red at exactly this
    point. Simulate: grant every current-window query a verdict at
    round max+1, recompute the priority from that history, and assert
    no query outside the recomputed window exceeds MAX_AGE."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries import (
        _DRIVER_WINDOW,
        REGISTRY,
        _compute_driver_priority,
    )

    latest = _verdict_history()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json history (fresh checkout)")
    this_round = max(latest.values()) + 1
    sim = dict(latest)
    for name in list(REGISTRY)[:_DRIVER_WINDOW]:
        sim[name] = this_round
    next_window = set(_compute_driver_priority(sim))
    next_round = this_round + 1
    stale = {
        n: next_round - sim[n]
        for n in REGISTRY
        if n in sim and n not in next_window and next_round - sim[n] > MAX_AGE
    }
    assert not stale, (
        f"self-rotation would leave stale verdicts the round after this one: {stale}"
    )


def test_capacity_policy_two_rounds_out():
    """CAPACITY-POLICY simulation (r10 — VERDICT r9 item 3): starting
    from the live history, land this round's verdict, then simulate TWO
    further rounds each growing the registry by the policy-maximum
    number of new queries (_policy_growth_cap). Every simulated round's
    window must seat all never-verified newcomers, and after each
    verdict lands no query may age past the bound — i.e. the declared
    growth rate provably fits inside the 50-slot / age-3 structure."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries import (
        _DRIVER_WINDOW,
        REGISTRY,
        _compute_driver_priority,
        _policy_growth_cap,
    )

    latest = _verdict_history()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json history (fresh checkout)")
    sim = dict(latest)
    names = list(REGISTRY)
    this_round = max(latest.values()) + 1
    for n in names[:_DRIVER_WINDOW]:  # this round's verdict lands
        sim[n] = this_round
    for k in (1, 2):  # two future rounds at max policy growth
        rnd = this_round + k
        growth = _policy_growth_cap(len(names))
        names = names + [f"q{800 + 10 * k + i}_sim_new" for i in range(growth)]
        window = _compute_driver_priority(sim, names)
        newcomers = [n for n in names if n not in sim]
        missing = [n for n in newcomers if n not in set(window)]
        assert not missing, f"round +{k}: newcomers without a slot: {missing}"
        for n in window:
            sim[n] = rnd
        next_round = rnd + 1
        next_window = set(_compute_driver_priority(sim, names))
        stale = {
            n: next_round - sim[n]
            for n in names
            if n in sim and n not in next_window and next_round - sim[n] > MAX_AGE
        }
        assert not stale, f"round +{k}: capacity policy would strand verdicts: {stale}"


def test_at_capacity_policy():
    """AT-CAPACITY rule (r19 — VERDICT r18 item 3, recorded before it
    binds): after q203 the registry holds 198 of 200 structural slots
    and the surface is declared complete — growth defaults to zero,
    the 2 residual slots are repair-only, and any genuinely new row
    must first execute the pre-approved retirement ladder
    (q149 → q121 → q105, each keeping an oracle-verified sibling).
    This test pins the math and keeps the ladder LIVE: a rung that
    got renamed/deleted, or a sibling that lost its oracle, fails
    here instead of surprising the round that needs the ladder."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries import (
        _CAPACITY,
        REGISTRY,
        _policy_growth_cap,
    )

    # Residual-slot math: at the declared-complete size the structural
    # cap leaves exactly the repair reserve; at capacity it is zero.
    assert len(REGISTRY) <= _CAPACITY
    assert _policy_growth_cap(len(REGISTRY)) == _CAPACITY - len(REGISTRY)
    assert _policy_growth_cap(_CAPACITY) == 0

    # Retirement ladder: every rung is a live driver query, and every
    # named sibling that would carry its row is live WITH an oracle.
    ladder = {
        "q149_pipe_corpus_scale": ["q148_pipeline_spec_run"],
        "q121_prefix_jaccard_corpus": [
            "q107_prefix_jaccard",
            "q147_containment_pairs",
            "q165_containment_prefix_corpus",
        ],
        "q105_length_histogram": ["q156_histogram_quantile_rollup"],
    }
    for rung, siblings in ladder.items():
        assert rung in REGISTRY, f"retirement-ladder rung vanished: {rung}"
        for sib in siblings:
            assert sib in REGISTRY, f"ladder sibling vanished: {sib} (for {rung})"
            assert REGISTRY[sib].oracle is not None, (
                f"ladder sibling {sib} lost its oracle — {rung} could no "
                f"longer retire safely"
            )
