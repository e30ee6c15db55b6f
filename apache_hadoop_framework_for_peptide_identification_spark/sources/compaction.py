"""Small-file compaction — the layout remediation every long-lived
ingest needs (SURVEY.md §2B sources table, added r8).

Streaming sinks, per-partition writers, and frequent small loads leave
directories with thousands of KB-scale files; at 100 TB that is the
classic scan killer (one task + one open + one footer read per file,
schedulers drowning in splits — the same pathology HDFS documents for
NameNode metadata, which the reference's Hadoop world inherits).
Compaction rewrites a directory to ~target-size files and changes
NOTHING else: same rows, same schema, one pay-once shuffle — the same
"pay at write time, win at every read" economics as bucketing/Z-order
(`sources/bucketing.py`, `sources/zorder.py`).

Sizing is measured, not guessed: the input's actual on-disk bytes
divided by ``target_bytes`` gives the output file count. Sizes come
from the Hadoop FileSystem API (r9, VERDICT r8 item 2), NOT from
driver-side ``os.path.getsize`` — so the same helper works on the
deployments a 100 TB compaction actually targets (``hdfs://``,
``s3a://``) and on percent-encoded local paths, exactly as the scan
itself resolves them. `repartition(n)` is a round-robin exchange, so
output files are near-uniform; a catalog table would use its
OPTIMIZE/rewrite action with the same arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def hadoop_file_sizes(spark: SparkSession, uris: list[str]) -> list[int]:
    """Byte sizes of ``uris`` via the Hadoop FileSystem API — the same
    resolution path the scan uses, so every scheme the cluster can
    read (file:, hdfs:, s3a:, percent-encoded local paths) sizes
    correctly. One ``FileSystem`` handle per scheme+authority (Hadoop
    caches them too, but the dict avoids the per-call JVM hop).

    Driver-side listing is O(files) metadata calls — fine up to the
    ~10^5-file directories compaction exists to fix; beyond that a
    catalog's manifest statistics replace the listing entirely."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    fs_cache: dict[str, object] = {}
    sizes: list[int] = []
    for u in uris:
        # inputFiles() returns percent-encoded URI strings; Path(String)
        # would keep %20 literal, so parse as a java.net.URI (decodes).
        uri = jvm.java.net.URI(u)
        path = jvm.org.apache.hadoop.fs.Path(uri)
        key = f"{uri.getScheme()}://{uri.getAuthority()}"
        fs = fs_cache.get(key)
        if fs is None:
            fs = fs_cache[key] = path.getFileSystem(hconf)
        sizes.append(fs.getFileStatus(path).getLen())
    return sizes


def plan_compaction(spark: SparkSession, src_dir: str, target_bytes: int) -> tuple[int, int, int]:
    """(n_files, total_bytes, n_out): measured input layout and the
    resulting output file count ``ceil(total/target)`` (min 1)."""
    df = spark.read.parquet(src_dir)
    files = df.inputFiles()
    total = sum(hadoop_file_sizes(spark, files))
    n_out = max(1, math.ceil(total / target_bytes))
    return len(files), total, n_out


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Rewrite ``src_dir``'s parquet files into ``dst_dir`` at
    ~``target_bytes`` per file; returns the compacted frame (read back
    from the destination, so the caller verifies the SINK contents).
    Row-preserving by construction — repartition is a pure exchange."""
    _, _, n_out = plan_compaction(spark, src_dir, target_bytes)
    spark.read.parquet(src_dir).repartition(n_out).write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)
