"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.RUNTIME_CONFS) handles sort-merge skew at runtime; these
operators are the EXPLICIT form for when the skew is known and extreme
(one key holding >1% of 100 TB), or when the engine must not depend on
runtime re-planning:

- salted_agg: phase 1 aggregates on (keys, salt) so the hot key's rows
  spread over `buckets` reducers; phase 2 combines the per-salt
  partials. Only re-aggregatable functions are offered (sum/count/
  min/max — avg decomposes to sum+count) because phase 2 must merge
  partials exactly.
- salted_join: the big side gets a deterministic per-row salt; the
  small side is exploded `buckets`× (one copy per salt value) so the
  equi-join key becomes (key, salt) and the hot key's matches spread
  across `buckets` tasks. Small-side inflation is the price — use only
  when the small side is modest and the big side's key is hot.

Salts are derived from row content via xxhash64 — deterministic across
retries/speculation (a random salt would break task re-execution).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PHASE1 = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
# How phase 2 merges phase-1 partials.
_PHASE2 = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}


def _salt(cols: Sequence[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).alias("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt_cols: Sequence[str],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: (fn, col, alias) with fn in {sum, count, min, max}.
    salt_cols: columns whose hash spreads the hot key's rows — use a
    high-cardinality column (an id, a timestamp), NOT the group key.
    """
    for fn, _, _ in aggs:
        if fn not in _PHASE1:
            raise ValueError(f"{fn} is not re-aggregatable; use sum/count/min/max")
    salted = df.withColumn("__salt", _salt(salt_cols, buckets))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[_PHASE1[fn](c).alias(a) for fn, c, a in aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[_PHASE2[fn](a).alias(a) for fn, _, a in aggs]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_cols: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side per-row, replicate the
    small side once per salt value, join on (on..., __salt).

    Result columns = big ∪ small minus duplicate join keys (like a
    plain `big.join(small, on, how)`).

    Only big-side-preserving joins are supported: the small side is
    replicated ``buckets``x, so any join that null-extends or emits
    unmatched SMALL-side rows (right/full outer, right_semi) would
    surface each unmatched small row once per salt copy — silent row
    multiplication. Those modes need a different strategy (AQE skew
    join or broadcast)."""
    supported = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in supported:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only {sorted(supported)}; "
            f"got {how!r} — unmatched small-side rows would be emitted once per salt bucket"
        )
    b = big.withColumn("__salt", _salt(salt_cols, buckets))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(s, [*on, "__salt"], how).drop("__salt")
