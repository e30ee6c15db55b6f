"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API —
the §2B sources-table extension point): a deterministic partitioned
synthetic-sequence source used to prove the engine can host
user-defined sources end to end (registration, schema declaration,
partition PLANNING on the driver, per-partition generation on
executors).

The reference engine's only extension point is the external binary it
forks per split (ExecutorMapper.java:142-226); Spark's Python Data
Source is the modern equivalent surface: `partitions()` is the split
computation, `read(partition)` the per-split record reader. At 100 TB
a real implementation points partitions at external shards (object
keys, kafka offsets, DB ranges) — the planning/reading contract
exercised here is identical.

The source is arrow-batched by Spark (DefaultSource → mapInArrow
internally); rows are yielded as plain tuples matching the declared
schema.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticSequenceDataSource(DataSource):
    """`spark.read.format("synthseq").option("n", N).option("parts", P)`:
    ids 0..N-1 in P contiguous chunks, val = (id*id) mod 97 — a closed
    form any SQL oracle reproduces exactly."""

    @classmethod
    def name(cls) -> str:
        return "synthseq"

    def schema(self) -> str:
        return "pid int, id long, val long"

    def reader(self, schema) -> "SyntheticSequenceReader":
        return SyntheticSequenceReader(self.options)


class SyntheticSequenceReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):  # driver-side split planning
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):  # executor-side per-split generation
        p = partition.value
        lo = self.n * p // self.parts
        hi = self.n * (p + 1) // self.parts
        for i in range(lo, hi):
            yield (p, i, (i * i) % 97)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SyntheticSequenceDataSource)
