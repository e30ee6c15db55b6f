"""Property test for the q156 histogram-quantile construction: the
selected median bin must always contain the LOWER median (the
⌈n/2⌉-th sorted value) — the precise form of the operator's error
bound (the bin midpoint is then within half a bin of it). Random
value sets, including adversarial ones clustered at bin edges, are
checked against a plain sorted-list reference. Pure-python replica of
the engine's integer rank rule (cum*2 >= tot ⇒ min bin), so the rule
itself is what's under test — the engine/oracle SQL agreement is
covered by the q156 hash match.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

WIDTH = 1000


def _med_bin(values: list[float]) -> int:
    """The engine's rule: counts per floor(v/WIDTH) bin, first bin whose
    doubled cumulative count reaches the total."""
    from collections import Counter

    bins = Counter(math.floor(v / WIDTH) for v in values)
    tot = len(values)
    cum = 0
    for b in sorted(bins):
        cum += bins[b]
        if cum * 2 >= tot:
            return b
    raise AssertionError("unreachable: cumulative never reached total")


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=50_000.0, allow_nan=False),
        min_size=1,
        max_size=200,
    )
)
def test_median_bin_contains_lower_median(values):
    lower_median = sorted(values)[(len(values) + 1) // 2 - 1]
    b = _med_bin(values)
    assert b == math.floor(lower_median / WIDTH), (
        f"selected bin {b} does not contain the lower median "
        f"{lower_median} (expected bin {math.floor(lower_median / WIDTH)})"
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=50).map(lambda k: float(k * WIDTH)),
        min_size=2,
        max_size=100,
    )
)
def test_median_bin_on_exact_bin_edges(values):
    """Adversarial: every value sits exactly ON a bin edge (v = k·WIDTH
    belongs to bin k by floor) — tie-heavy cumulative counts must still
    select the lower median's bin."""
    lower_median = sorted(values)[(len(values) + 1) // 2 - 1]
    assert _med_bin(values) == math.floor(lower_median / WIDTH)
