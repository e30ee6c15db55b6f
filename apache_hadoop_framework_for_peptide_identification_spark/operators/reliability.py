"""Checkpoint durability policy — pricing the localCheckpoint fault
envelope (r19, VERDICT r18 "What's wrong").

The engine truncates lineage at ~30 sites (iterative loops, multi-
consumer fan-outs, pandas-UDF single-execution pins). Every one of
them used ``localCheckpoint`` unconditionally, which is the FASTEST
materialization but also the least durable: blocks live ONLY in the
executors' caching subsystem with NO lineage left to recompute them,
so on a real cluster **losing one executor after the checkpoint makes
those partitions unrecoverable and fails the job**. Invisible on
local[32]; near-certain over an hours-long 100 TB corpus build across
thousands of executors. This module is the ONE place that trade is
priced, and :func:`materialize` is the knob the corpus-sized sites
thread through (dedup_mix_pack, the PageRank/CC iteration loops; see
SCALE.md "Checkpoint durability" for the full regime table).

Three regimes, cost vs. what survives:

- ``"local"`` (default — every fixture/bench path): executor-cache
  blocks at the session's default storage level, zero extra I/O.
  Survives NOTHING: any executor loss after materialization is
  job-fatal (Spark cannot recompute a truncated lineage). Right for
  short jobs where a rare retry-from-scratch is cheaper than paying
  durability tax on every run — and for local mode, where "executor
  loss" means the whole JVM died anyway.
- ``"replicated"``: ``localCheckpoint`` at ``MEMORY_AND_DISK_2`` —
  every block lives on TWO executors (Spark 4's storageLevel
  parameter). Survives any SINGLE executor loss between replica
  placements; concurrent/rolling losses can still kill both copies.
  Costs one extra network copy of the materialized bytes, no DFS
  round-trip. The middle regime for multi-hour jobs on clusters with
  uncorrelated failures.
- ``"reliable"``: ``DataFrame.checkpoint()`` — blocks written to the
  ``SparkContext.setCheckpointDir`` DFS path. Survives ANY number of
  executor losses (tasks re-read from DFS). Costs one full write +
  re-read of the materialized bytes through the DFS. The regime for
  the 100 TB corpus build itself: the checkpointed frames there are
  the SMALL mid-pipeline survivors (keeper ids, normalized keeper
  rows, rank tables — orders of magnitude below the input scan), so
  the DFS tax is bounded while the job gains restartability at every
  truncation point.

Parity contract: the regimes change WHERE blocks live, never what any
query returns — pinned by tests/test_reliability.py running
dedup_mix_pack and pagerank_int under all three regimes against the
default-mode output. The envelope itself is fault-injection-tested
there too (purge the materialized blocks: local dies with Spark's
checkpoint-block-not-found, reliable re-reads from the DFS), and the
wall-clock tax is measured in BASELINE.md (`make checkpoint-tax`:
2–4% at sf0.1 — proportional to the CHECKPOINTED bytes, not the
corpus).

Housekeeping under ``"reliable"``: checkpoint files stay on the DFS
until the application exits. A long-lived session running MANY
finalization builds should set
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` so files
whose frames are GC'd are reaped, or point ``setCheckpointDir`` at a
per-job path it removes afterwards — otherwise the checkpoint dir
grows by one materialized frame per build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: The three durability regimes, in cheapest-first order. Public so
#: tests and measurement scripts iterate THIS tuple instead of
#: hand-copying it — a fourth regime added here is automatically
#: parity-tested and priced.
MODES = ("local", "replicated", "reliable")
_MODES = MODES  # backward-compat alias


def materialize(df: DataFrame, mode: str = "local", eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage under the chosen
    durability regime (module doc). ``"reliable"`` requires a
    checkpoint directory; failing loudly here beats Spark's late
    executor-side error after the upstream work already ran.

    Lazy reliable checkpoints persist first: a bare
    ``checkpoint(eager=False)`` leaves the blocks unpersisted, so the
    subtree re-executes once PER CONSUMER plus once for the
    checkpoint-write job (accumulator-verified: 2x executions on a
    2-consumer fan-out) — silently forfeiting the materialize-once
    guarantee every call site exists to provide. With the persist,
    the first action computes the frame once into cache, the
    checkpoint-write job and every later consumer read it back
    (verified 1x), and durability still comes from the DFS copy."""
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "replicated":
        from pyspark import StorageLevel

        return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.MEMORY_AND_DISK_2)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "checkpoint_mode='reliable' needs a reliable checkpoint "
                "directory: call spark.sparkContext.setCheckpointDir(<DFS "
                "path>) first (an executor-local path silently gives NO "
                "durability on a real cluster — use HDFS/S3/shared storage)"
            )
        if eager:
            return df.checkpoint(eager=True)
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK).checkpoint(eager=False)
    raise ValueError(
        f"checkpoint_mode must be one of {MODES}; got {mode!r}"
    )
