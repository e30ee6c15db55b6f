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
    MODES,
    materialize,
)


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


def test_sitemap_frontier_parity_across_modes(spark, ckpt_dir):
    from apache_hadoop_framework_for_peptide_identification_spark.operators import (
        urls as U,
    )

    fetched = spark.createDataFrame(
        [
            ("https://a.com/index.xml",
             "<sitemapindex>"
             "<sitemap><loc>https://a.com/c1.xml</loc></sitemap>"
             "<sitemap><loc>https://a.com/c2.xml</loc></sitemap>"
             "</sitemapindex>"),
            ("https://a.com/c1.xml",
             "<urlset><url><loc>https://a.com/p1</loc></url></urlset>"),
            ("https://a.com/c2.xml",
             "<sitemapindex>"
             "<sitemap><loc>https://a.com/c3.xml</loc></sitemap>"
             "</sitemapindex>"),
            ("https://a.com/c3.xml",
             "<urlset><url><loc>https://a.com/p2</loc></url>"
             "<url><loc>https://a.com/p3</loc></url></urlset>"),
        ],
        "url string, xml string",
    )
    seeds = spark.createDataFrame(
        [("a.com", "https://a.com/index.xml")], "host string, sitemap_url string"
    )
    out = {
        m: _collect_sorted(
            U.sitemap_frontier(fetched, seeds, checkpoint_mode=m).select(
                "loc", "depth", "source_sitemap"
            )
        )
        for m in MODES
    }
    assert out["replicated"] == out["local"]
    assert out["reliable"] == out["local"]
    # pages surface at BOTH depths (1 via c1, 2 via the nested c2→c3
    # index), so every per-level _mat truncation actually executed
    assert sorted(d for _, d, _ in out["local"]) == [1, 2, 2]


def test_global_sort_rank_parity_across_modes(spark, ckpt_dir):
    """The one CORPUS-sized checkpoint site: the range-partitioned
    frame. Keys deliberately arrive unsorted and skewed across input
    partitions so the range exchange + prefix-offset join do real
    work under every regime."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators.pipeline import (
        epoch_shuffle,
        global_sort_rank,
    )

    df = spark.range(0, 97, 1, 5).withColumn(
        "key", F.md5(F.col("id").cast("string"))
    )
    out = {
        m: _collect_sorted(
            global_sort_rank(df, "key", n_partitions=4, checkpoint_mode=m)
        )
        for m in MODES
    }
    assert out["replicated"] == out["local"]
    assert out["reliable"] == out["local"]
    ranked = sorted((r[1], r[2]) for r in out["local"])  # (key, pos)
    assert [p for _, p in ranked] == list(range(1, 98))  # dense, key-ordered

    ep = {
        m: _collect_sorted(
            epoch_shuffle(spark.range(20), "id", epoch=3, checkpoint_mode=m)
        )
        for m in MODES
    }
    assert ep["replicated"] == ep["local"] and ep["reliable"] == ep["local"]


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
    # and those writes are lz4'd: the engine session sets the core
    # conf (0.52x bytes A/B, BASELINE.md r19) — pin it so a builder
    # refactor can't silently drop it
    assert (
        spark.sparkContext.getConf().get("spark.checkpoint.compress") == "true"
    ), "engine session lost spark.checkpoint.compress"


def test_materialize_once_across_modes_and_eagerness(spark, ckpt_dir):
    """The guarantee every call site exists for: the subtree executes
    EXACTLY ONCE no matter the regime or eagerness, and NOTHING is
    left in the Dataset CacheManager. Both pins guard measured
    regressions: a bare checkpoint(eager=False) executes the subtree
    twice (consumer job + checkpoint-write job), and persist-before-
    lazy-checkpoint restores 1x but leaks a plan-keyed cache entry
    that substitutes stale data into later identical plans — which is
    why reliable mode always checkpoints eagerly."""
    from pyspark.sql.types import LongType

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    # start from a known-empty cache so the per-mode isEmpty asserts
    # blame materialize() and not some earlier test's leftover cache
    # (the session is shared module-to-module)
    spark.catalog.clearCache()
    for mode in MODES:
        for eager in (True, False):
            acc = spark.sparkContext.accumulator(0)

            @F.udf(LongType())
            def tick(x, _acc=acc):
                _acc.add(1)
                return x

            df = materialize(
                spark.range(0, 200, 1, 4).select(tick("id").alias("v")),
                mode,
                eager=eager,
            )
            df.count()
            df.agg(F.sum("v")).collect()  # second consumer
            assert acc.value == 200, (
                f"mode={mode} eager={eager}: subtree executed "
                f"{acc.value / 200:.1f}x, want exactly 1x"
            )
            assert cache_mgr.isEmpty(), (
                f"mode={mode} eager={eager}: left a CacheManager entry — "
                "later identical plans would silently read it"
            )


def _purge_new_rdd_blocks(spark, fn):
    """Fault injection: run ``fn`` (which materializes a frame), then
    remove every executor-cache block of the RDDs it pinned — the
    closest local[*] analogue of losing the executors that held a
    truncated frame's blocks. Uses the JVM BlockManagerMaster through
    the private gateway (test-only; there is no public purge API)."""
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = fn()
    new = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    bmm = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get().blockManager().master()
    for rid in new:
        bmm.removeRdd(int(rid), True)
    return out, new


def test_executor_block_loss_is_fatal_local_but_survivable_reliable(spark, ckpt_dir):
    """The durability claim itself, not just row parity (r19): after
    the materialized blocks vanish (simulated executor loss), a
    ``local`` frame is UNRECOVERABLE — Spark raises its
    checkpoint-block-not-found error because the lineage is gone —
    while a ``reliable`` frame re-reads from the checkpoint dir and
    still answers. This is the exact failure SCALE.md prices for an
    hours-long 100 TB build; the test makes it observable at
    fixture scale."""
    from py4j.protocol import Py4JJavaError

    def build(mode):
        return materialize(
            spark.range(0, 500, 1, 4).withColumn("x", F.col("id") * 7), mode
        )

    lost, new_local = _purge_new_rdd_blocks(spark, lambda: build("local"))
    assert new_local, "local mode pinned no executor blocks to lose"
    with pytest.raises(Py4JJavaError, match="[Cc]heckpoint block"):
        lost.count()

    saved, new_rel = _purge_new_rdd_blocks(spark, lambda: build("reliable"))
    # reliable mode holds NOTHING in executor caches — its blocks are
    # DFS files, so there is nothing to lose and the count survives
    assert new_rel == set()
    assert saved.count() == 500

    # replicated survives SINGLE-executor loss via the second replica;
    # local[*] has one block manager, so losing "all executors" kills
    # both copies — the documented limit of the middle regime
    repl, new_repl = _purge_new_rdd_blocks(spark, lambda: build("replicated"))
    assert new_repl, "replicated mode pinned no executor blocks"
    with pytest.raises(Py4JJavaError, match="[Cc]heckpoint block"):
        repl.count()
