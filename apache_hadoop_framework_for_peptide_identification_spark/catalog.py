"""Test-table catalog: typed loaders for the driver-generated fixtures.

The reference engine's only schema notion is a single header line
prepended per partition (ExecutorMapper.java:142-145, sourced at
Driver.java:91-108). Here schema is a first-class ``StructType`` that
travels with the DataFrame; the parquet footer is the header.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (applicationId, sf_dir, table) -> DataFrame. A DataFrame is an
# immutable logical plan, so reuse across calls is safe and skips the
# per-call file listing + footer read (which otherwise dominates
# repeated small queries — the bench method charges it to every run).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Canonicalize ``events.ts`` to TimestampType regardless of which
    fixture generation wrote the parquet file.

    The driver has regenerated the fixtures with different physical
    types across rounds:

    - INT64 TIMESTAMP(NANOS): Spark 4 rejects it outright unless
      ``nanosAsLong`` is set, under which it scans as a raw long that
      we truncate to microseconds via integer division (``ts div
      1000`` — NOT ``ts/1000``, which goes through double and loses
      precision above 2^53 ns) and rebind as TimestampType.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): scans as
      ``timestamp_ntz``; with the session timezone pinned UTC the cast
      to TimestampType is value-identical and keeps one canonical type
      for every downstream window/watermark/join.

    Shared by the batch catalog AND the streaming source so a fixture
    regeneration can never split them (round-4 regression: the stream
    path hardcoded the nanos layout and silently produced Jan-1970
    timestamps when the fixture switched to micros).
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with type normalization (see
    :func:`normalize_events_ts` for the ``events.ts`` contract)."""
    configure(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    _TABLE_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every fixture as a temp view (for the SQL API surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
