"""As-of join — latest right-row at-or-before each left row, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). This composes one
from a union + running ``last(ignorenulls)`` window, which costs exactly
ONE shuffle on the join keys — the same cost as the sort-merge join a
native implementation would do, so it scales like any keyed join:

- 100 TB path: both sides shuffle-partition on ``on`` keys; state per
  partition is one running value per right column (no buffering of the
  whole group). Skewed keys behave like any skewed SMJ — AQE skew-join
  does not apply to window ops, so pre-salt hot keys if a key exceeds
  a partition budget.
- Tie semantics: a right row with ts == left ts IS matched (inclusive,
  "at or before"), matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.
  If the right side has duplicate (key, ts) rows the result is
  nondeterministic — pre-aggregate the right side to one row per
  (key, ts), as a native asof would too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    inclusive: bool = True,
) -> DataFrame:
    """Left as-of join: for every left row, attach the right row with the
    greatest ``right_ts`` <= ``left_ts`` (strictly < when inclusive=False)
    within the same ``on`` key group. Unmatched left rows keep nulls.

    Returns all left columns plus the right payload columns
    (right columns minus keys and ``right_ts``).
    """
    on = list(on)
    payload = [c for c in right.columns if c not in on and c != right_ts]
    lpay = [c for c in left.columns if c not in on and c != left_ts]
    if not payload:
        return left

    # The right payload travels as ONE struct, so the matched row is
    # carried atomically — its NULL fields stay NULL instead of being
    # back-filled per-column from older right rows (a native ASOF join
    # returns the matched row whole; per-column last(ignorenulls) can
    # stitch different right rows together when payload columns are
    # sparse).
    # Column names are backtick-quoted everywhere so a name containing
    # dots is taken literally, not as a nested path.
    def _bq(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    pay_type = StructType([right.schema[c] for c in payload])
    onq = [F.col(_bq(c)).alias(c) for c in on]
    lt = left.select(
        *onq,
        F.col(_bq(left_ts)).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(_bq(c)) for c in lpay],
        F.lit(None).cast(pay_type).alias("__rpay"),
    )
    rt = right.select(
        *onq,
        F.col(_bq(right_ts)).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        F.struct(*[F.col(_bq(c)).alias(c) for c in payload]).alias("__rpay"),
    )
    # At equal __ts the right row must sort before the left row for
    # inclusive semantics (and after it for exclusive).
    order = [F.col("__ts").asc(), F.col("__is_left").asc() if inclusive else F.col("__is_left").desc()]
    w = Window.partitionBy(*[F.col(_bq(c)) for c in on]).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = lt.unionByName(rt).select(
        *[F.col(_bq(c)) for c in on],
        "__ts",
        "__is_left",
        *[F.col(_bq(c)) for c in lpay],
        F.last(F.col("__rpay"), ignorenulls=True).over(w).alias("__rpay"),
    )
    out = filled.filter(F.col("__is_left") == 1).withColumnRenamed("__ts", left_ts)
    # getField (not "__rpay.{c}" string paths): a payload column whose
    # name contains a dot would otherwise be parsed as a nested path.
    rpay = F.col("__rpay")
    return out.select(
        *[F.col(_bq(c)) for c in left.columns],
        *[rpay.getField(c).alias(c) for c in payload],
    )
