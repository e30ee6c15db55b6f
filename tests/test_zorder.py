"""Z-order layout (sources/zorder.py): the pruning payoff, measured.

q157's oracle proves the rewrite is lossless and the interleave
arithmetic matches SQL; this test proves the PHYSICAL claim — files
written along the z-curve cover small rectangles of the key plane, so
a 2-D band predicate overlaps strictly fewer files (by footer min/max
stats) than the natural layout of the same data. This is exactly the
statistic a parquet reader's file/row-group skipping uses.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
from apache_hadoop_framework_for_peptide_identification_spark.sources.zorder import (
    write_zordered,
    zvalue,
)

SF = "/root/testdata/sf0.001"
N_FILES = 16
# Band on BOTH dimensions (sf0.001 domains: partkey ≤ 200, suppkey ≤ 10).
PART_LO, PART_HI = 40, 80
SUPP_LO, SUPP_HI = 2, 5


def _files_overlapping(path: str) -> tuple[int, int]:
    """(#files whose [min,max] of BOTH band columns overlap the band,
    #files total) from parquet footers only."""
    total = overlapping = 0
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        pi, si = names.index("l_partkey"), names.index("l_suppkey")
        p_min = min(md.row_group(g).column(pi).statistics.min for g in range(md.num_row_groups))
        p_max = max(md.row_group(g).column(pi).statistics.max for g in range(md.num_row_groups))
        s_min = min(md.row_group(g).column(si).statistics.min for g in range(md.num_row_groups))
        s_max = max(md.row_group(g).column(si).statistics.max for g in range(md.num_row_groups))
        total += 1
        if p_min <= PART_HI and p_max >= PART_LO and s_min <= SUPP_HI and s_max >= SUPP_LO:
            overlapping += 1
    return overlapping, total


def test_zorder_prunes_more_files_than_natural_layout(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    base = tempfile.mkdtemp(prefix="zorder_test_")
    z_path = os.path.join(base, "z")
    nat_path = os.path.join(base, "nat")
    write_zordered(li, z_path, "l_partkey", "l_suppkey", num_files=N_FILES)
    # Natural layout: same file count, insertion (orderkey) order.
    li.repartitionByRange(N_FILES, "l_orderkey").write.mode("overwrite").parquet(nat_path)

    z_hit, z_total = _files_overlapping(z_path)
    n_hit, n_total = _files_overlapping(nat_path)
    assert z_total == n_total == N_FILES, (z_total, n_total)
    # The natural layout scatters (partkey, suppkey) uniformly, so
    # essentially every file overlaps the band; the z-layout must beat
    # it outright — that difference IS the data-skipping win.
    assert z_hit < n_hit, (
        f"z-order layout gave no pruning advantage: z={z_hit}/{z_total} "
        f"vs natural={n_hit}/{n_total} files overlapping the band"
    )


def test_zorder_roundtrip_preserves_rows(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="zorder_rt_"), "li")
    write_zordered(li, path, "l_partkey", "l_suppkey", num_files=N_FILES)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    # z-value of the max-bit corner sanity-pins the interleave: bit i of
    # a → 2i+1, bit i of b → 2i.
    row = (
        spark.range(1)
        .select(zvalue(F.lit(0b101), F.lit(0b011)).alias("z"))
        .first()
    )
    assert row["z"] == 0b100111, bin(row["z"])


def test_zvalue_interleave_is_invertible(spark):
    """Property: the Morton interleave must be a bijection on 16+16-bit
    pairs — decode(z) == (a, b) for a deterministic sample spanning the
    bit range. A dropped or shifted term in the 32-term expression
    breaks this immediately."""
    pairs = [(a, b) for a in (0, 1, 2, 255, 256, 32767, 65535)
             for b in (0, 1, 3, 128, 4095, 65535)]
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        a = b = 0
        for i in range(16):
            a |= ((r["z"] >> (2 * i + 1)) & 1) << i
            b |= ((r["z"] >> (2 * i)) & 1) << i
        assert (a, b) == (r["a"], r["b"]), (r["a"], r["b"], bin(r["z"]))
