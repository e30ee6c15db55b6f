"""E-PIPE query: a real external-command chain over a staged partition
file — the reference's whole computation model (SURVEY.md §2A) with a
POSIX awk stand-in for the MATLAB CRANKER binaries. Oracle-verified:
the chain's per-doc token count must equal the SQL token count, which
also proves header handling and partition invariance at sf0.01."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.pipe import ChainSpec, run_chain
from . import query

# Two-stage chain sharing %TMP_FILE_1% (the argFileMap memoization
# semantics of ExecutorMapper.java:197-203): stage 1 reads the staged
# headered TSV and computes tokens per doc; stage 2 re-reads the shared
# temp file and emits the final output file.
TOKEN_CHAIN = ChainSpec(
    stages=[
        [
            "awk",
            "-F",
            "\t",
            "-v",
            "out=%TMP_FILE_1%",
            'NR > 1 { n = split($2, a, " "); print $1 "\t" n > out }',
            "%INPUT_FILE%",
        ],
        [
            "awk",
            "-F",
            "\t",
            "-v",
            "out=%OUTPUT_FILE%",
            '{ print $1 "\t" $2 > out }',
            "%TMP_FILE_1%",
        ],
    ],
    env={"PIPE_CACHE_ROOT": "/tmp/epipe-cache"},  # MCR_CACHE_ROOT analog
    header=True,
)


@query(
    "q50_pipe_tokens",
    oracle="""
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id
""",
)
def q50_pipe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage each documents partition as a headered TSV, run the 2-stage
    awk chain, collect outputs as typed rows. Zero shuffle (map-only,
    like Driver.java:128) until the final presentation sort."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = run_chain(d, TOKEN_CHAIN, "doc_id long, n_tokens long")
    return out.orderBy("doc_id")


@query(
    "q77_pipe_lines",
    oracle="""
SELECT text AS value FROM documents
WHERE text LIKE '%the%' ORDER BY value
""",
)
def q77_pipe_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pipe_lines (§2B E-PIPE table): the simpler stdin/stdout
    line-streaming variant of the external-process operator — document
    lines piped through a grep filter, stdout lines back as rows. One
    external process per partition, zero shuffle until the
    presentation sort."""
    from ..operators.pipe import pipe_lines

    d = load_table(spark, sf_dir, "documents").select("text")
    return pipe_lines(d, ["grep", "the"]).orderBy("value")
