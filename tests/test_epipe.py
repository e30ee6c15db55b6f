"""E-PIPE tests (SURVEY.md §5.2 item 3): a stand-in CRANKER chain —
deterministic POSIX scripts in read → write shape — verifying header
presence, %TMP_FILE_N% memoization (ExecutorMapper.java:197-203
semantics), env injection (MCR_CACHE_ROOT analog,
ExecutorMapper.java:174-177), non-zero-exit task failure
(ExecutorMapper.java:267-268), declared-schema output coercion, and
partition-count invariance of the merged result.
"""

from __future__ import annotations

import json
import os
import stat
import subprocess
import sys

import pytest

from apache_hadoop_framework_for_peptide_identification_spark.operators.pipe import (
    ChainSpec,
    _coerce_to_schema,
    _parse_fields,
    run_chain,
)
from apache_hadoop_framework_for_peptide_identification_spark.plans import spec as spec_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _script(path, body):
    with open(path, "w") as f:
        f.write("#!/bin/sh\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR)
    return str(path)


@pytest.fixture(scope="module")
def cranker_bin(tmp_path_factory):
    """Stand-in CRANKER: read (header check + uppercase) → solve
    (append marker) → write (env check + copy), sharing %TMP_FILE_1%
    and %TMP_FILE_2% like run_cranker_*.sh (properties.json:10-12)."""
    d = tmp_path_factory.mktemp("bin")
    _script(
        d / "read.sh",
        # Fails unless line 1 is the header — proves header injection.
        'head -n1 "$1" | grep -q "^doc_id" || exit 4\n'
        "awk -F'\\t' 'BEGIN{OFS=\"\\t\"} NR==1{next} {print $1, toupper($2)}' \"$1\" > \"$2\"\n",
    )
    _script(d / "solve.sh", 'sed "s/$/\\tsolved/" "$1" > "$2"\n')
    _script(
        d / "write.sh",
        '[ -n "$MCR_CACHE_ROOT" ] || { echo "env missing" >&2; exit 3; }\n'
        'cp "$2" "$3"\n',
    )
    return str(d)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, f"text {i}") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id int, body string")


def _chain(cranker_bin):
    return ChainSpec(
        stages=[
            [f"{cranker_bin}/read.sh", "%INPUT_FILE%", "%TMP_FILE_1%"],
            [f"{cranker_bin}/solve.sh", "%TMP_FILE_1%", "%TMP_FILE_2%"],
            # write.sh sees BOTH tmp files — memoization means
            # %TMP_FILE_2% here is the same path solve.sh wrote.
            [f"{cranker_bin}/write.sh", "%TMP_FILE_1%", "%TMP_FILE_2%", "%OUTPUT_FILE%"],
        ],
        env={"MCR_CACHE_ROOT": "/tmp/mcr_cache_test"},
    )


OUT_SCHEMA = "doc_id bigint, body string, marker string"


def test_chain_end_to_end(spark, docs_df, cranker_bin):
    out = run_chain(docs_df, _chain(cranker_bin), OUT_SCHEMA).toPandas()
    assert len(out) == 20
    assert set(out.marker) == {"solved"}
    assert out.set_index("doc_id").loc[7, "body"] == "TEXT 7"
    # Declared-schema coercion: external tools emit text; the contract
    # decides types.
    assert str(out.doc_id.dtype) == "int64"


def test_partition_invariance(spark, docs_df, cranker_bin):
    """Merged result is independent of partitioning (the reference's
    per-split design, Driver.java:128,135-136)."""
    a = run_chain(docs_df.repartition(1), _chain(cranker_bin), OUT_SCHEMA).toPandas()
    b = run_chain(docs_df.repartition(7), _chain(cranker_bin), OUT_SCHEMA).toPandas()
    key = ["doc_id", "body", "marker"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_nonzero_exit_fails_task(spark, docs_df):
    chain = ChainSpec(stages=[["false"]])
    with pytest.raises(Exception, match="E-PIPE stage failed"):
        run_chain(docs_df, chain, "doc_id bigint").collect()


def test_missing_env_fails(spark, docs_df, cranker_bin):
    chain = ChainSpec(
        stages=[[f"{cranker_bin}/write.sh", "%TMP_FILE_1%", "%TMP_FILE_1%", "%OUTPUT_FILE%"]],
        env={},  # no MCR_CACHE_ROOT → write.sh exits 3
    )
    with pytest.raises(Exception, match="E-PIPE stage failed"):
        run_chain(docs_df, chain, "doc_id bigint").collect()


def test_parse_fields_nested_types():
    assert _parse_fields("a bigint, b decimal(10,2), c string") == [
        ("a", "bigint"),
        ("b", "decimal(10,2)"),
        ("c", "string"),
    ]


def test_parse_fields_angle_bracket_types():
    # ADVICE round 1: parameterized complex types must not split at
    # their INNER commas.
    assert _parse_fields("m map<string,int>, a array<struct<x:int,y:int>>, z string") == [
        ("m", "map<string,int>"),
        ("a", "array<struct<x:int,y:int>>"),
        ("z", "string"),
    ]


def test_pipe_lines_spaced_argv(spark):
    """A list argv token containing spaces must survive pipe_lines
    (ADVICE round 1: RDD.pipe re-tokenizes with shlex.split, so tokens
    need shlex quoting — the ExecutorMapper.java:243 defect class)."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators.pipe import pipe_lines

    df = spark.createDataFrame(
        [("foo bar",), ("foo baz",), ("nope",)], "value string"
    )
    out = pipe_lines(df, ["grep", "foo bar"]).collect()
    assert sorted(r["value"] for r in out) == ["foo bar"]


def test_coerce_to_schema_types():
    import pandas as pd

    df = pd.DataFrame({"a": ["1", ""], "b": ["true", "false"], "c": ["x", "y"]})
    out = _coerce_to_schema(df, [("a", "bigint"), ("b", "boolean"), ("c", "string")])
    assert str(out.a.dtype) == "Int64" and out.a.isna().iloc[1]
    assert list(out.b) == [True, False]
    assert list(out.c) == ["x", "y"]


# --- CLI surface (mirrors mrexecutor <algorithm> <spec> [header],
# Driver.java:42-46) ---


@pytest.fixture(scope="module")
def cli_spec(tmp_path_factory, cranker_bin):
    d = tmp_path_factory.mktemp("cli")
    in_dir = d / "in"
    in_dir.mkdir()
    with open(in_dir / "data.tsv", "w") as f:
        f.write("doc_id\tbody\n1\talpha\n2\tbeta\n")
    spec = {
        "env": {"MCR_CACHE_ROOT": "/tmp/mcr_cache_test"},
        "algorithms": [
            {
                "name": "CRANKER",
                "binary_dir": cranker_bin,
                "executables": [
                    {"command": "read.sh %INPUT_FILE% %TMP_FILE_1%"},
                    {"command": "solve.sh %TMP_FILE_1% %TMP_FILE_2%"},
                    {"command": "write.sh %TMP_FILE_1% %TMP_FILE_2% %OUTPUT_FILE%"},
                ],
                "in_dir": str(in_dir),
                "out_dir": str(d / "out"),
                "output_schema": OUT_SCHEMA,
                "input_format": "csv",
                "sep": "\t",
            }
        ],
    }
    path = d / "spec.json"
    with open(path, "w") as f:
        json.dump(spec, f)
    return str(path), str(d / "out")


def test_cli_run_algorithm(spark, cli_spec):
    """In-process CLI path (case-insensitive lookup, Driver.java:70-76)."""
    path, out_dir = cli_spec
    out = spec_mod.run_algorithm(spark, spec_mod.load_spec(path), "cranker").toPandas()
    assert sorted(out.body) == ["ALPHA", "BETA"]
    files = os.listdir(out_dir)
    assert any(f.endswith(".parquet") for f in files)


def test_cli_unknown_algorithm_exit_1(cli_spec):
    path, _ = cli_spec
    with pytest.raises(spec_mod.AlgorithmNotFound, match="available"):
        spec_mod.select_algorithm(spec_mod.load_spec(path), "nope")


def test_cli_usage_exit_2():
    proc = subprocess.run(
        [sys.executable, "-m", "apache_hadoop_framework_for_peptide_identification_spark.plans.spec"],
        env={**os.environ, "PYTHONPATH": REPO},
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 2
    assert "usage" in proc.stderr


def test_cli_header_argument_selects_columns(spark, cli_spec, cranker_bin, tmp_path):
    """The optional header argument (DATA_HEADER analog,
    Driver.java:91-101) declares the staged column order — staging
    must honor it."""
    spec = spec_mod.load_spec(cli_spec[0])
    out = spec_mod.run_algorithm(
        spark, spec, "CRANKER", header=["doc_id", "body"], write=False
    ).toPandas()
    assert sorted(out.body) == ["ALPHA", "BETA"]


def test_run_algorithm_parquet_input(spark, cranker_bin, tmp_path):
    """input_format=parquet: the chain stages typed parquet rows as a
    headered TSV transparently."""
    in_dir = str(tmp_path / "pq_in")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, body string"
    ).write.parquet(in_dir)
    spec = {
        "env": {"MCR_CACHE_ROOT": "/tmp/mcr_cache_test"},
        "algorithms": [
            {
                "name": "PQ",
                "binary_dir": cranker_bin,
                "executables": [
                    {"command": "read.sh %INPUT_FILE% %TMP_FILE_1%"},
                    {"command": "solve.sh %TMP_FILE_1% %TMP_FILE_2%"},
                    {"command": "write.sh %TMP_FILE_1% %TMP_FILE_2% %OUTPUT_FILE%"},
                ],
                "in_dir": in_dir,
                "out_dir": str(tmp_path / "pq_out"),
                "output_schema": OUT_SCHEMA,
                "input_format": "parquet",
            }
        ],
    }
    out = spec_mod.run_algorithm(spark, spec, "PQ", write=False).toPandas()
    assert sorted(out.body) == ["ALPHA", "BETA"]


def test_run_algorithm_text_input(spark, tmp_path):
    """input_format=text: raw lines flow through a line-oriented chain
    (one `value` column, the reference's TextInputFormat shape)."""
    in_dir = tmp_path / "txt_in"
    in_dir.mkdir()
    (in_dir / "lines.txt").write_text("aaa\nbb\nc\n")
    upper = _script(
        tmp_path / "upper.sh",
        "awk 'NR==1{next} {print toupper($0)}' \"$1\" > \"$2\"\n",
    )
    spec = {
        "algorithms": [
            {
                "name": "TXT",
                "binary_dir": "",
                "executables": [{"command": f"{upper} %INPUT_FILE% %OUTPUT_FILE%"}],
                "in_dir": str(in_dir),
                "out_dir": str(tmp_path / "txt_out"),
                "output_schema": "value string",
                "input_format": "text",
            }
        ],
    }
    out = spec_mod.run_algorithm(spark, spec, "txt", write=False).toPandas()
    assert sorted(out.value) == ["AAA", "BB", "C"]
