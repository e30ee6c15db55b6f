"""Top-k operators.

Global top-k: ``orderBy(...).limit(k)`` — Catalyst plans this as
TakeOrderedAndProject: each partition keeps a k-heap, the driver merges
N_partitions * k rows. No full sort, no shuffle of the full data; safe
at any scale for small k.

Per-group top-k: window rank + filter — one shuffle on the group key,
rank computed streaming per partition. At 100 TB with few very hot
groups, pre-aggregate or salt; for large k prefer
``rank <= k`` on a pre-filtered candidate set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
