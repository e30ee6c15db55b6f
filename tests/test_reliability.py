"""Checkpoint-durability parity (r19 — VERDICT r18 "What's wrong").

The `checkpoint_mode` knob (operators/reliability.py) prices the
localCheckpoint fault envelope: "local" (executor-cache blocks,
job-fatal on executor loss), "replicated" (2× replicas, survives
single loss), "reliable" (DFS checkpoint, survives any loss). The
contract these tests pin: the regimes change WHERE blocks live and
what survives executor loss — never what any operator returns. Each
knob-carrying operator runs under all three regimes and must produce
IDENTICAL rows; the reliable mode's loud no-checkpoint-dir guard is
pinned too (failing at the call site beats Spark's late executor-side
error after the upstream work already ran).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators.graph import (
    pagerank_int,
)
from apache_hadoop_framework_for_peptide_identification_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from apache_hadoop_framework_for_peptide_identification_spark.operators.pipeline import (
    dedup_mix_pack,
)
from apache_hadoop_framework_for_peptide_identification_spark.operators.reliability import (
    materialize,
)

MODES = ("local", "replicated", "reliable")


@pytest.fixture(scope="module")
def ckpt_dir(spark):
    """Reliable checkpoint dir for the module; restored to unset-like
    state is impossible (SparkContext has no clearCheckpointDir), but
    the session fixture outlives every module anyway — the guard test
    below therefore runs FIRST, before this fixture ever sets it."""
    d = tempfile.mkdtemp(prefix="reliable_ckpt_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    spark.sparkContext.setCheckpointDir(d)
    return d


def test_reliable_mode_requires_checkpoint_dir_guard(spark):
    """Must run before ckpt_dir is ever requested in this module:
    reliable mode without setCheckpointDir raises the loud ValueError
    at the call site, not a late executor-side Spark error."""
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("a checkpoint dir is already set in this session")
    df = spark.range(3)
    with pytest.raises(ValueError, match="setCheckpointDir"):
        materialize(df, "reliable")


def test_unknown_mode_rejected(spark):
    with pytest.raises(ValueError, match="checkpoint_mode"):
        materialize(spark.range(1), "durable")


def _fixture_docs(spark):
    """Tiny corpus with exact dups (1≡2), a near-dup pair (3~4), and
    distinct rows across two topics — exercises every ladder tier."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "news", base),
        (2, "news", base.upper()),  # casefold dup of 1
        (3, "blog", base + " extra tail words here"),
        (4, "blog", base + " extra tail words there"),  # near-dup of 3
        (5, "news", "completely different text about spark checkpoints"),
        (6, "blog", "another unrelated document concerning parquet files"),
    ]
    return spark.createDataFrame(rows, "rec_id long, topic string, clean_text string")


def _collect_sorted(df):
    return [tuple(r) for r in df.orderBy(*df.columns).collect()]


def test_dedup_mix_pack_parity_across_modes(spark, ckpt_dir):
    docs = _fixture_docs(spark)
    out = {
        m: _collect_sorted(
            dedup_mix_pack(docs, target_total=4, budget=32, checkpoint_mode=m)
        )
        for m in MODES
    }
    assert out["replicated"] == out["local"]
    assert out["reliable"] == out["local"]
    assert len(out["local"]) > 0


def test_pagerank_parity_across_modes(spark, ckpt_dir):
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (3, 1, 1), (1, 3, 3), (4, 1, 1)],
        "src long, dst long, w long",
    )
    out = {
        m: _collect_sorted(
            pagerank_int(edges, "src", "dst", "w", iters=7, checkpoint_every=2,
                         checkpoint_mode=m).select("node", "rank_int")
        )
        for m in MODES
    }
    assert out["replicated"] == out["local"]
    assert out["reliable"] == out["local"]


def test_connected_components_parity_across_modes(spark, ckpt_dir):
    # two components + a self-loop singleton; chain long enough to
    # force several propagation rounds
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)],
        "id_a long, id_b long",
    )
    for fn in (connected_components, connected_components_star):
        out = {
            m: _collect_sorted(fn(edges, checkpoint_mode=m)) for m in MODES
        }
        assert out["replicated"] == out["local"], fn.__name__
        assert out["reliable"] == out["local"], fn.__name__
        labels = dict(out["local"])
        assert labels[4] == 1 and labels[11] == 10 and labels[20] == 20, fn.__name__


def test_reliable_mode_actually_writes_to_checkpoint_dir(spark, ckpt_dir):
    """The reliable regime must be a REAL DFS checkpoint (files under
    the checkpoint dir), not a silent localCheckpoint fallback — the
    durability claim rests on the blocks living off-executor."""
    import os

    before = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    df = materialize(spark.range(100).withColumn("x", F.col("id") * 2), "reliable")
    assert df.count() == 100
    after = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    assert after > before, "reliable mode wrote nothing under the checkpoint dir"
