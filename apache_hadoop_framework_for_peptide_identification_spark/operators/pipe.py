"""E-PIPE: external-process pipeline operators — the reference engine's
actual capability surface (SURVEY.md §2A R1-R10) rebuilt Spark-first.

Reference parity map (citations into /root/reference):
- stage_partition == header injection + partition spool
  (ExecutorMapper.java:142-145, 153-156): each partition is
  materialized as ONE headered local file so an external file-oriented
  tool sees a self-contained input; process startup is amortized to
  once per partition, not per record (the reference's core insight —
  MATLAB MCR boot is expensive; Driver.java:128 map-only design).
- run_chain == command templating + sequential multi-stage fork
  (ExecutorMapper.java:174-208): %INPUT_FILE%/%OUTPUT_FILE%/
  %TMP_FILE_N% placeholders, temp files memoized per N so stages share
  intermediates (ExecutorMapper.java:197-203), env injection
  (MCR_CACHE_ROOT, ExecutorMapper.java:174-177), non-zero exit fails
  the task => Spark retries the attempt (ExecutorMapper.java:267-268).
- collect_outputs == the side-file sink (ExecutorMapper.java:210-226),
  except rows are returned THROUGH the engine (mapInPandas yield) so
  Spark's task-commit protocol makes retries/speculation safe — the
  reference's copy-to-HDFS races on attempt collisions (§2A notes).

Conscious fixes over the reference (not ported):
- argv lists via subprocess, never naive whitespace split
  (ExecutorMapper.java:243 breaks on paths with spaces);
- concurrent stdout/stderr draining via subprocess.run capture
  (sequential draining at ExecutorMapper.java:245-263 can deadlock);
- literal placeholder substitution, not regex replaceAll
  (ExecutorMapper.java:191-192 corrupts on '$' or '\\' in values).

Scale: zero shuffle — a narrow mapInPandas per partition, exactly the
reference's map-only topology (Driver.java:128 setNumReduceTasks(0)).
"""

from __future__ import annotations

import os
import shlex
import subprocess
import tempfile
from collections.abc import Iterator, Sequence
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame

INPUT_FILE = "%INPUT_FILE%"
OUTPUT_FILE = "%OUTPUT_FILE%"
TMP_FILE = "%TMP_FILE_{n}%"


@dataclass(frozen=True)
class ChainSpec:
    """An ordered external-command chain over staged partition files.

    stages: argv lists; tokens may contain %INPUT_FILE%, %OUTPUT_FILE%
            and %TMP_FILE_N% placeholders (N memoized per partition so
            stages share intermediates, mirroring argFileMap at
            ExecutorMapper.java:197-203).
    env:    extra environment for every stage (the MCR_CACHE_ROOT
            analog, ExecutorMapper.java:174-177).
    header: prepend a header line to the staged input
            (ADD_DATA_HEADER / DATA_HEADER, Driver.java:91-108).
    sep:    field separator for staging and output parsing.
    """

    stages: Sequence[Sequence[str]]
    env: dict[str, str] = field(default_factory=dict)
    header: bool = True
    sep: str = "\t"


def _expand(token: str, mapping: dict[str, str]) -> str:
    for k, v in mapping.items():
        token = token.replace(k, v)  # literal, not regex (see module doc)
    return token


def _tmp_path(memo: dict[str, str], placeholder: str, workdir: str) -> None:
    if placeholder not in memo:
        fd, path = tempfile.mkstemp(dir=workdir, prefix=placeholder.strip("%") + "_")
        os.close(fd)
        memo[placeholder] = path


def _parse_fields(schema: str) -> list[tuple[str, str]]:
    """Split a DDL schema string into (name, type) pairs, respecting
    both parenthesized types like decimal(10,2) and angle-bracketed
    complex types like map<string,int> / array<struct<x:int,y:int>>."""
    fields: list[str] = []
    depth, cur = 0, ""
    for ch in schema:
        if ch == "," and depth == 0:
            fields.append(cur)
            cur = ""
        else:
            depth += ch in "(<"
            depth -= ch in ")>"
            cur += ch
    fields.append(cur)
    out = []
    for f in fields:
        parts = f.strip().split(None, 1)
        out.append((parts[0], parts[1].lower() if len(parts) > 1 else "string"))
    return out


def _coerce_to_schema(out: pd.DataFrame, fields: list[tuple[str, str]]) -> pd.DataFrame:
    """Coerce the tool's text output to the DECLARED schema — external
    tools emit text; the declared contract, not pandas inference,
    decides the types (else an int-looking string column breaks the
    Arrow boundary)."""
    for name, typ in fields:
        s = out[name]
        if typ in ("int", "integer", "smallint", "tinyint", "bigint", "long"):
            out[name] = pd.to_numeric(s.replace("", None)).astype("Int64")
        elif typ in ("float", "double", "real") or typ.startswith("decimal"):
            out[name] = pd.to_numeric(s.replace("", None)).astype("float64")
        elif typ == "boolean":
            out[name] = s.str.lower().map(
                {"true": True, "false": False, "1": True, "0": False}
            ).astype("boolean")
        elif typ in ("timestamp", "date"):
            out[name] = pd.to_datetime(s.replace("", None))
    return out


def run_chain(
    df: DataFrame,
    spec: ChainSpec,
    output_schema: str,
    *,
    input_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Stage each partition to a headered local file, run the command
    chain over it, parse %OUTPUT_FILE% back into rows of
    ``output_schema``. See module docstring for reference parity."""
    cols = list(input_cols or df.columns)
    sep = spec.sep
    stages = [list(s) for s in spec.stages]
    extra_env = dict(spec.env)
    add_header = spec.header

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        with tempfile.TemporaryDirectory(prefix="epipe_") as workdir:
            in_path = os.path.join(workdir, "in.txt")
            out_path = os.path.join(workdir, "out.txt")
            n_rows = 0
            # R2+R3: header then verbatim spool of the whole partition.
            with open(in_path, "w", encoding="utf-8") as f:
                if add_header:
                    f.write(sep.join(cols) + "\n")
                for pdf in batches:
                    n_rows += len(pdf)
                    for row in pdf[cols].itertuples(index=False):
                        f.write(sep.join("" if v is None else str(v) for v in row) + "\n")
            mapping = {INPUT_FILE: in_path, OUTPUT_FILE: out_path}
            memo: dict[str, str] = {}
            env = dict(os.environ)
            env.update(extra_env)
            for argv in stages:
                for tok in argv:
                    for ph in re.findall(r"%TMP_FILE_\d+%", tok):
                        _tmp_path(memo, ph, workdir)
                full = {**mapping, **memo}
                expanded = [_expand(tok, full) for tok in argv]
                # R5: fork; non-zero exit fails the task attempt -> Spark
                # retries it, same as ExecutorMapper.java:267-268.
                proc = subprocess.run(expanded, env=env, capture_output=True, text=True)
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"E-PIPE stage failed ({proc.returncode}): {expanded!r}\n"
                        f"stderr: {proc.stderr[-2000:]}"
                    )
            # R7: collect outputs as engine rows (commit-safe).
            fields = _parse_fields(output_schema)
            names = [n for n, _ in fields]
            if os.path.exists(out_path) and os.path.getsize(out_path) > 0:
                out = pd.read_csv(
                    out_path, sep=sep, header=None, names=names,
                    dtype=str, keep_default_na=False,
                )
                out = _coerce_to_schema(out, fields)
            else:
                out = pd.DataFrame({n: pd.Series(dtype="object") for n in names})
            yield out

    return df.mapInPandas(fn, output_schema)


def pipe_lines(df: DataFrame, command: Sequence[str] | str, env: dict[str, str] | None = None) -> DataFrame:
    """Simpler stdin/stdout line-streaming variant (R5 for filter-style
    tools): each partition's single string column is piped through
    ``command``; stdout lines come back as rows.

    The only RDD usage in the engine — RDD.pipe is genuinely the right
    primitive for line-streaming subprocesses.
    """
    if len(df.columns) != 1:
        raise ValueError("pipe_lines expects a single string column")
    spark = df.sparkSession
    rdd = df.rdd.map(lambda r: "" if r[0] is None else str(r[0]))
    # RDD.pipe re-tokenizes its command string with shlex.split, so a
    # list argv must be shlex-QUOTED per token — a bare " ".join would
    # split tokens containing spaces/quotes, the exact whitespace-split
    # defect this module documents against ExecutorMapper.java:243.
    cmd = command if isinstance(command, str) else shlex.join(command)
    piped = rdd.pipe(cmd, env=env or {})
    return spark.createDataFrame(piped.map(lambda line: (line,)), "value string")
