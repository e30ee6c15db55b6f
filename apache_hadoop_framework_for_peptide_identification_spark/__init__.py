"""PySpark-native analytics engine with the capability surface of the
reference ``com.optforms:mrexecutor`` (a map-only Hadoop scatter-gather
harness for external peptide-identification binaries; see
``/root/reference/src/main/java/com/optforms/mrexecutor``) re-expressed
as idiomatic Spark, plus the relational / streaming / LLM-data-pipeline
operator contract declared in SURVEY.md §2B.

Layout
------
- ``session``    SparkSession factory + runtime config normalizer
- ``catalog``    test-table loader (incl. nanos-timestamp normalization)
- ``queries``    the oracle-verified query registry (driver contract)
- ``operators``  composed operators Spark lacks natively
  (as-of join, range join, top-k, dedup, similarity, text analysis,
  E-PIPE external-process chains, multimodal column plumbing)
- ``sources``    typed readers/writers for parquet/csv/json/text/binary
- ``plans``      JSON pipeline-spec loader + CLI (mirrors Driver.java)
- ``streaming``  Structured Streaming operators (windows, dedup, state)
"""

__version__ = "0.1.0"
