"""Source/sink queries (SURVEY.md §2B sources table): every format the
engine reads/writes proven by a write→read-back roundtrip whose final
aggregate the DuckDB oracle checks against the ORIGINAL parquet — a
roundtrip that loses or mangles rows cannot match.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import multimodal
from ..sources import readers
from . import query
from ._scratch import _scratch_dir


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q70_parquet_partitioned_sink",
    oracle="""
SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS sum_price
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def q70_parquet_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + scan-back: orders written
    PARTITIONED BY o_orderpriority, read back, re-aggregated. At scale
    partitionBy is what makes `WHERE o_orderpriority = ...` a
    partition-pruned scan instead of a full read."""
    out = _scratch_dir("sink_parquet_")
    orders = _t(spark, sf_dir, "orders")
    readers.write_parquet(orders, out, partition_by=["o_orderpriority"])
    back = readers.read_parquet(spark, out)
    return (
        back.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("sum_price"))
        .orderBy("o_orderpriority")
    )


@query(
    "q71_csv_roundtrip",
    oracle="""
SELECT c_mktsegment, count(*) AS n, sum(c_acctbal) AS sum_bal
FROM customer GROUP BY 1 ORDER BY 1
""",
)
def q71_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headered CSV sink + schema'd scan-back (the typed replacement
    for the reference's DATA_HEADER text contract, Driver.java:91-108)."""
    out = _scratch_dir("sink_csv_")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    readers.write_csv(cust, out)
    back = readers.read_csv(
        spark, out, schema="c_custkey long, c_mktsegment string, c_acctbal double"
    )
    return (
        back.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c_acctbal").alias("sum_bal"))
        .orderBy("c_mktsegment")
    )


@query(
    "q72_json_roundtrip",
    oracle="""
SELECT n_regionkey, count(*) AS n_nations,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
FROM nation GROUP BY 1 ORDER BY 1
""",
)
def q72_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newline-delimited JSON sink + schema'd scan-back."""
    out = _scratch_dir("sink_json_")
    nation = _t(spark, sf_dir, "nation")
    readers.write_json(nation, out)
    back = readers.read_json(
        spark, out, schema="n_nationkey long, n_name string, n_regionkey long"
    )
    return (
        back.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.sum("n_nationkey").alias("key_sum"))
        .orderBy("n_regionkey")
    )


@query(
    "q73_text_scan",
    oracle="""
SELECT count(*) AS n_lines,
       CAST(sum(len(replace(text, chr(10), ' '))) AS BIGINT) AS total_chars
FROM documents
""",
)
def q73_text_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-line text sink + scan (the reference's TextInputFormat
    semantics, ExecutorMapper.java:38): one `value: string` column,
    one row per line. Newlines flattened on write so line count ==
    doc count."""
    out = _scratch_dir("sink_text_")
    docs = _t(spark, sf_dir, "documents").select(
        F.regexp_replace("text", "\n", " ").alias("value")
    )
    docs.write.mode("overwrite").text(out)
    back = readers.read_text(spark, out)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
    )


@query(
    "q109_orc_roundtrip",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY 1 ORDER BY 1
""",
)
def q109_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan-back (Spark's native vectorized ORC path — the
    Hive-ecosystem interchange format): lineitem written partitioned by
    return flag, read back, re-aggregated; sum in DECIMAL so the
    roundtrip check is order-independent."""
    out = _scratch_dir("sink_orc_")
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    readers.write_orc(li, out, partition_by=["l_returnflag"])
    back = readers.read_orc(spark, out)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q122_schema_evolution",
    oracle="""
SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
FROM orders
UNION ALL
SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderstatus FROM orders
ORDER BY o_orderkey, o_totalprice NULLS FIRST
""",
)
def q122_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution (the sources-table gap every long-lived
    ingest hits: files written before and after a column was added must
    scan as ONE table): two generations with disjoint non-key columns
    land in the same directory, read back with ``mergeSchema`` — each
    row surfaces with NULLs for the columns its generation lacked. The
    oracle reproduces the union-with-nulls from the original table, so
    a dropped column, a misaligned merge, or generation rows lost all
    hash-mismatch. At 100 TB mergeSchema costs one footer read per
    FILE at plan time — enable it per-read (as here), not globally;
    with a catalog (Delta/Iceberg) the log supplies the merged schema
    instead."""
    src = _scratch_dir("schema_evo_")
    o = _t(spark, sf_dir, "orders")
    o.select("o_orderkey", "o_totalprice").write.mode("append").parquet(src)
    o.select("o_orderkey", "o_orderstatus").write.mode("append").parquet(src)
    back = spark.read.option("mergeSchema", "true").parquet(src)
    return back.select("o_orderkey", "o_totalprice", "o_orderstatus").orderBy(
        "o_orderkey", F.col("o_totalprice").asc_nulls_first()
    )


@query(
    "q128_xml_roundtrip",
    oracle="""
SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name) AS first_nation
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
)
def q128_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML sink + scan-back (Spark 4.0 built-in XML source — no
    spark-xml package): nation written with a rowTag, read back with
    schema inference, re-aggregated. Proves element naming, type
    inference (BIGINT keys round-trip as longs), and row framing. XML
    is a row-framed text format — scans split by rowTag exactly like
    csv/json lines, so the 100 TB story matches the other text
    sources."""
    out = _scratch_dir("sink_xml_")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    n.write.format("xml").option("rowTag", "nation").mode("overwrite").save(out)
    back = spark.read.format("xml").option("rowTag", "nation").load(out)
    return (
        back.groupBy(F.col("n_regionkey").cast("bigint").alias("n_regionkey"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "q129_python_datasource",
    oracle="""
SELECT CAST(i // 1250 AS INTEGER) AS pid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum((i * i) % 97) AS BIGINT) AS sum_val
FROM range(10000) t(i)
GROUP BY 1 ORDER BY 1
""",
)
def q129_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4 `pyspark.sql.datasource`):
    the engine hosts a user-defined source end to end — driver-side
    partition planning (8 InputPartitions), executor-side generation,
    arrow-batched ingestion (sources/pyds.py). The per-partition
    aggregate pins BOTH the data (closed-form val the oracle
    reproduces) and the split planning (pid ↔ contiguous 1250-id
    chunks): a source that mis-plans splits or drops a partition
    hash-mismatches. The reference's per-split external reader
    (ExecutorMapper.java:142-226) maps onto exactly this
    partitions()/read() contract."""
    from ..sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format("synthseq")
        .option("n", 10_000)
        .option("parts", 8)
        .load()
    )
    return (
        df.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_val"))
        .orderBy("pid")
    )


@query(
    "q69_multimodal_decode",
    oracle="""
SELECT doc_id,
       CAST(64 + ('0x' || substr(md5(text), 1, 2))::INT % 192 AS INT)       AS width,
       CAST(64 + ('0x' || substr(md5(text), 3, 2))::INT % 192 AS INT)       AS height,
       CAST(1 + (('0x' || substr(md5(text), 5, 2))::INT % 2) * 2 AS INT)    AS n_channels,
       CAST(3 AS BIGINT)                                                    AS n_frames
FROM documents WHERE doc_id < 100 ORDER BY doc_id
""",
)
def q69_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + frame-sample plumbing over binary payloads
    (deterministic fake decode — codec libs absent; see
    operators/multimodal.py): payload → (width, height, channels) and
    3 sampled frames per doc, joined on doc_id. Schema/batch shapes
    are the real contract; determinism asserted in
    tests/test_multimodal.py. Hash-verified since r8: the fake decode
    derives dims from the payload md5, which the oracle recomputes
    from hex-pair slices of DuckDB's md5(text) — byte i of the digest
    is hex chars [2i, 2i+2). The doc subset is a deterministic
    doc_id predicate (pushed to the scan), not limit() — limit on an
    unordered scan is partition-order-dependent and cannot be
    hash-compared."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    with_payload = multimodal.attach_payload(docs)
    decoded = multimodal.decode_image(with_payload, fake=True)
    frames = multimodal.frame_sample(with_payload, n_frames=3)
    frame_counts = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return decoded.join(frame_counts, "doc_id").orderBy("doc_id")


@query(
    "q151_bucketed_colocated_join",
    oracle="""
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_li,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
""",
)
def q151_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join (sources/bucketing.py, until now
    plan-asserted in pytest only): both join sides are written
    bucketed+sorted by the join key through the session catalog, then
    sort-merge-joined — the planner reads co-located buckets and drops
    BOTH join-side Exchanges (the zero-shuffle plan is asserted in
    tests/test_bucketing.py; this query pins the RESULT of that plan
    against the plain-join oracle). The `merge` hint keeps the
    demonstration independent of the session's broadcast threshold
    instead of mutating shared session conf. At 100 TB this is the
    repeated fact⋈fact answer: the shuffle is paid once at write time,
    every subsequent join is narrow. Price sums aggregate in
    DECIMAL(18,2) and cast once — the q08/q09 float-order rule."""
    import os

    from ..sources.bucketing import read_table, write_bucketed

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    # External tables at fresh temp locations: a MANAGED location can
    # outlive the in-memory catalog entry across sessions and fail the
    # next create with LOCATION_ALREADY_EXISTS.
    base = _scratch_dir("q151_bkt_")
    write_bucketed(
        li, "q151_li_bkt", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=os.path.join(base, "li"),
    )
    write_bucketed(
        o, "q151_o_bkt", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=os.path.join(base, "o"),
    )
    joined = (
        read_table(spark, "q151_li_bkt")
        .hint("merge")
        .join(
            read_table(spark, "q151_o_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_li"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


from ..sources.zorder import write_zordered, zvalue, zvalue_sql  # noqa: E402


@query(
    "q157_zorder_layout",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST({zvalue_sql('l_partkey', 'l_suppkey')} AS BIGINT) AS zval
FROM lineitem
WHERE l_partkey <= 150 AND l_suppkey <= 8
ORDER BY l_orderkey, l_linenumber
""",
)
def q157_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout for two-dimensional data skipping
    (sources/zorder.py): lineitem is rewritten range-partitioned and
    sorted by the bit-interleave of (l_partkey, l_suppkey) — a pure
    32-term shift/mask JVM expression, no UDF — then read back through
    a 2-D band predicate. The oracle recomputes every surviving row's
    z-value bit-for-bit in SQL from the RAW table, so the hash match
    proves the layout rewrite is lossless AND the interleave
    arithmetic is identical on both engines. The payoff is physical,
    not logical: each written file covers a small rectangle of the
    key plane, so predicates on EITHER dimension prune files by
    footer stats — measured directly in tests/test_zorder.py (the
    z-layout must overlap strictly fewer files than the natural
    layout for the same band). One pay-once shuffle at write time,
    like bucketing; at 100 TB this is the plain-parquet equivalent of
    a table format's OPTIMIZE ZORDER."""
    import os

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    path = os.path.join(_scratch_dir("q157_z_"), "li")
    write_zordered(li, path, "l_partkey", "l_suppkey", num_files=16)
    back = spark.read.parquet(path)
    return (
        back.filter((F.col("l_partkey") <= 150) & (F.col("l_suppkey") <= 8))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            zvalue(F.col("l_partkey"), F.col("l_suppkey")).alias("zval"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q169_corrupt_record_quarantine",
    oracle="""
WITH lines AS (
  SELECT doc_id,
         '{"doc_id":' || doc_id || ',"lang":"' || lang || '","n_tokens":'
           || len(string_split(text, ' ')) || '}' AS good
  FROM documents)
SELECT CASE WHEN doc_id % 7 = 0 THEN TRUE ELSE FALSE END AS is_quarantined,
       CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id END  AS doc_id,
       CASE WHEN doc_id % 7 = 0
            THEN substring(good, 1, length(good) - 1) END   AS raw
FROM lines
ORDER BY is_quarantined, doc_id, raw
""",
)
def q169_corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record QUARANTINE on ingest — the dead-letter routing
    every large pipeline needs at the edge (a 100 TB scrape is never
    100% well-formed; failing the job on line 40 billion is not an
    option, and silently dropping is worse): a JSONL stage with every
    7th line deterministically truncated (closing brace removed) is
    read back in PERMISSIVE mode with a declared
    ``columnNameOfCorruptRecord`` — clean rows parse to typed columns,
    malformed rows surface with NULL fields and the RAW line preserved
    for the quarantine sink. The oracle never sees the staged file: it
    RECONSTRUCTS each line from the documents table (pinning Spark's
    ``to_json`` field order/formatting byte-for-byte) and applies the
    same corruption rule — so the hash match verifies the writer's
    rendering, the reader's malformed-line classification, AND the
    raw-line preservation together. Scale shape: the permissive scan
    is a normal parallel file read; the split into clean/quarantine is
    a narrow filter each way, no shuffle."""

    d = _t(spark, sf_dir, "documents")
    # Loud fixture-contract guard (the q148/q119 pattern): the oracle
    # reconstructs the JSON by plain string concatenation with NO
    # escaping, and to_json drops null fields — so a lang value
    # needing JSON escapes, or a NULL doc_id/lang/text, would split
    # the engines with an opaque hash mismatch. Fail here instead.
    bad = (
        d.filter(
            F.col("doc_id").isNull()
            | F.col("lang").isNull()
            | F.col("text").isNull()
            | ~F.col("lang").rlike("^[A-Za-z-]+$")
        )
        .limit(1)
        .count()
    )
    if bad:
        raise AssertionError(
            "q169 fixture contract broken: documents needs non-null doc_id/"
            "lang/text and an escape-free lang ([A-Za-z-]+) for the "
            "concatenation oracle to reproduce to_json byte-for-byte; "
            "regenerate the fixture or add escaping to BOTH sides"
        )
    line = F.to_json(
        F.struct(
            F.col("doc_id"),
            F.col("lang"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
    )
    # two-step select so the corruption expression can reference the
    # rendered line by name
    staged = (
        d.select(line.alias("l"), "doc_id")
        .select(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.expr("substring(l, 1, length(l) - 1)"),
            )
            .otherwise(F.col("l"))
            .alias("value")
        )
    )
    out = _scratch_dir("q169_jsonl_")
    staged.write.mode("overwrite").text(out)
    back = (
        spark.read.schema(
            "doc_id long, lang string, n_tokens long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return back.select(
        F.col("_corrupt_record").isNotNull().alias("is_quarantined"),
        "doc_id",
        F.col("_corrupt_record").alias("raw"),
    ).orderBy("is_quarantined", "doc_id", "raw")


@query(
    "q170_file_compaction",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_sum
FROM documents GROUP BY lang ORDER BY lang
""",
)
def q170_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (sources/compaction.py): documents
    deliberately shattered into 64 tiny parquet files, rewritten to
    measured ~target-size files, and the COMPACTED SINK read back and
    aggregated — a compaction that loses, duplicates, or mangles any
    row cannot match the oracle's aggregate over the original table.
    The layout half of the contract (file count shrinks to the
    measured ceil(total/target), near-uniform sizes) is asserted in
    tests/test_compaction.py — file counts are not SQL-observable.
    At 100 TB this is the classic scan killer's remediation: thousands
    of KB-scale streaming-sink files become one task + one footer read
    per ~128 MB, paid once with a single round-robin exchange."""

    from ..sources.compaction import compact_parquet

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    src = _scratch_dir("q170_small_")
    dst = _scratch_dir("q170_compact_")
    d.repartition(64).write.mode("overwrite").parquet(src)
    back = compact_parquet(spark, src, dst, target_bytes=4 * 1024 * 1024)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("tok_sum"),
        )
        .orderBy("lang")
    )
