"""Bucketed tables: the co-located-join layout for repeated big⋈big
joins.

At 100 TB the lineitem⋈orders shuffle is the dominant cost of every
query that touches both. Writing both tables bucketed (and sorted) by
the join key moves that shuffle to WRITE TIME, once: every subsequent
join reads co-located buckets and the planner drops the Exchange on
each side (asserted in tests/test_bucketing.py — the join plan must
contain zero shuffles).

Bucketed writes go through the session catalog (`saveAsTable` — plain
`parquet(path)` cannot record bucket metadata). Bucket counts should
be sized so one bucket of the big table fits an executor's memory at
the target scale; both sides MUST use the same count for co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``path`` makes the table EXTERNAL at that location. Without it the
    table is managed under the session's warehouse dir — and a managed
    location can survive the session that owns the catalog entry (the
    in-memory catalog forgets the table, the directory stays), which
    fails the next create with LOCATION_ALREADY_EXISTS. The pre-drop
    below clears the catalog entry; callers that may re-run across
    sessions should pass a fresh ``path`` (see q151)."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
