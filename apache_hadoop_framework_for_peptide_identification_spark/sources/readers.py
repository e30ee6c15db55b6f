"""Typed sources/sinks (SURVEY.md §2B sources table).

The reference's only source is a line-oriented HDFS text scan with a
runtime header string (Driver.java:135-136, 91-108); its only sink is
side-file copies (ExecutorMapper.java:210-226). Here every format is a
schema'd DataFrame reader/writer riding Spark's commit protocol —
always pass an explicit schema in production paths (inferSchema is an
extra full scan at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Columnar scan; Catalyst pushes filters + prunes columns into the
    scan — select early so ReadSchema stays narrow."""
    configure(spark)
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Headered or schema'd delimited text — the typed replacement for
    the reference's DATA_HEADER contract (R1+R2)."""
    configure(spark)
    reader = spark.read.option("header", header).option("sep", sep)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # tests only; see module doc
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    configure(spark)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw line scan — one `value: string` column, one task per split
    (the reference's TextInputFormat semantics, ExecutorMapper.java:38)."""
    configure(spark)
    return spark.read.text(path)


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """ORC columnar scan — same pushdown/pruning properties as parquet
    (Spark's native ORC reader is vectorized); the interchange format
    for Hive-ecosystem consumers of the engine's outputs."""
    configure(spark)
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def read_binary_files(spark: SparkSession, path: str, pattern: str | None = None) -> DataFrame:
    """Opaque payload ingest (multimodal): path, modificationTime,
    length, content(binary)."""
    configure(spark)
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    return reader.load(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True, sep: str = ",") -> None:
    df.write.mode(mode).option("header", header).option("sep", sep).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
