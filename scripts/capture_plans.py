#!/usr/bin/env python
"""Capture `.explain("formatted")` for every headline bench query.

Usage:
    python scripts/capture_plans.py <outdir> [suffix] [query ...]

Writes <outdir>/<query>_<suffix>.txt (suffix defaults to "before").
The optimization judge reads these files instead of running Spark, so
they are committed verbatim (plans/r19/).
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from apache_hadoop_framework_for_peptide_identification_spark.queries import (  # noqa: E402
    BENCH_REGISTRY,
    REGISTRY,
)
from apache_hadoop_framework_for_peptide_identification_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    outdir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "plans/r19")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    for name in names:
        fn = (REGISTRY.get(name) or BENCH_REGISTRY[name]).fn
        df = fn(spark, sf_dir)
        (outdir / f"{name}_{suffix}.txt").write_text(formatted_plan(df))
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
