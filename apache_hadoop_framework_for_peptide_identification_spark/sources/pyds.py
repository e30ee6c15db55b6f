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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class SyntheticSequenceDataSource(DataSource):
    """`spark.read.format("synthseq").option("n", N).option("parts", P)`:
    ids 0..N-1 in P contiguous chunks, val = (id*id) mod 97 — a closed
    form any SQL oracle reproduces exactly. Also registers a STREAMING
    reader (`spark.readStream.format("synthseq")`): the same sequence
    served in watermark-free micro-batches of `rows_per_batch` ids,
    exercising the full DataSourceStreamReader offset contract
    (initialOffset → latestOffset → partitions(start, end) → read →
    commit)."""

    @classmethod
    def name(cls) -> str:
        return "synthseq"

    def schema(self) -> str:
        return "pid int, id long, val long"

    def reader(self, schema) -> "SyntheticSequenceReader":
        return SyntheticSequenceReader(self.options)

    def streamReader(self, schema) -> "SyntheticSequenceStreamReader":
        return SyntheticSequenceStreamReader(self.options)


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


class SyntheticSequenceStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the same closed-form sequence: the
    stream position is a single `pos` cursor (JSON offset dict, the
    streaming analog of the batch reader's split plan); every
    latestOffset() call advances it by `rows_per_batch` ids until `n`
    is exhausted, and each batch's [start, end) range is split into
    `parts` executor-side partitions. At 100 TB the cursor is a shard
    offset vector (kafka offsets, object-store manifests) — the
    planning/reading/commit contract exercised here is identical.
    Deterministic end to end: no wall clock, no randomness, so an
    availableNow replay within ONE reader instance is byte-stable.

    Restart behavior (r7 ADVICE item 2): the cursor lives in this
    instance, so a restarted query constructs a fresh reader whose
    ``_latest`` is 0. Two distinct paths:

    - Restart with an IN-FLIGHT batch: Spark replays it by calling
      partitions(start, end) from the offset log BEFORE any
      latestOffset() — the clamp there advances the fresh cursor to
      the replayed range, so the subsequent latestOffset() continues
      from the committed position and the stream recovers correctly.
    - Restart where every batch was committed: latestOffset() runs
      first on the fresh cursor and can return an offset BEHIND the
      checkpointed start; the resulting inverted range is refused
      loudly (ValueError), never served as silently-empty batches.

    A durable source would persist the cursor with the offset log;
    for this synthetic sequence the in-flight recovery plus the loud
    refusal is the honest behavior."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))
        self.rows_per_batch = int(options.get("rows_per_batch", self.n))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self.rows_per_batch, self.n)
        return {"pos": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        # Checkpoint-restart guard: a fresh instance's cursor must never
        # trail the committed start, and an inverted range must fail the
        # batch rather than silently serve zero rows.
        self._latest = max(self._latest, lo)
        if hi < lo:
            raise ValueError(
                f"offset range inverted (start={lo}, end={hi}): reader cursor "
                "restarted behind the checkpoint — this synthetic source does "
                "not persist its cursor across query restarts"
            )
        span = hi - lo
        return [
            InputPartition((lo + span * p // self.parts, lo + span * (p + 1) // self.parts))
            for p in range(self.parts)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i % self.parts, i, (i * i) % 97)

    def commit(self, end: dict) -> None:
        # Offsets below `end` are durable in the sink; nothing to
        # release for a synthetic source.
        pass


def register(spark) -> None:
    """Idempotent per-session registration.

    Two worker-shipping concerns, both caught by the foreign-CWD
    driver simulation running a PyDS query FIRST in a fresh session:

    - session.configure → addPyFile ships the package to EXECUTOR
      workers (batch reads, q129).
    - The STREAMING source runner is a separate driver-side Python
      worker (PythonStreamingSourceRunner) that does NOT apply
      pyFiles, so a by-reference pickle of this module's classes fails
      to import there. Registering this module for BY-VALUE pickling
      with Spark's vendored cloudpickle makes the DataSource class
      self-contained wherever it is unpickled — the same deployment
      posture a real cluster needs unless the package is installed on
      every node.
    """
    import sys

    from pyspark import cloudpickle

    from ..session import configure

    configure(spark)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SyntheticSequenceDataSource)
