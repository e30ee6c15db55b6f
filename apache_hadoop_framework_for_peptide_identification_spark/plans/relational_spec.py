"""Declarative relational plan spec: JSON → DataFrame plan.

The reference's whole job model is a JSON config naming an algorithm
and its command templates (properties.json:1-18, selected by
Driver.java:66-85). This module generalizes that declarative surface to
the relational engine: a JSON document describes source → ops, and the
builder emits a DataFrame LOGICAL PLAN — expressions go through
``F.expr`` so Catalyst sees ordinary Catalyst expressions and every
optimization (pushdown, pruning, join selection, AQE) applies exactly
as if the plan had been written in code.

Spec shape:

    {
      "source": {"table": "lineitem"}            # fixture table, or
                {"path": "...", "format": "parquet|csv|json"},
      "ops": [
        {"op": "filter",     "condition": "<sql expr>"},
        {"op": "select",     "exprs": ["<sql expr> [AS alias]", ...]},
        {"op": "withColumn", "name": "c", "expr": "<sql expr>"},
        {"op": "join",       "right": {<nested spec>}, "on": [...],
                             "how": "inner", "broadcast": false},
        {"op": "groupBy",    "keys": [...],
                             "aggs": [{"expr": "sum(x)", "alias": "s"}]},
        {"op": "orderBy",    "keys": ["c desc", "d"]},
        {"op": "limit",      "n": 10},
        {"op": "distinct"} | {"op": "dropDuplicates", "subset": [...]}
      ]
    }
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


class PlanSpecError(ValueError):
    pass


def _source(spark: SparkSession, sf_dir: str, src: dict) -> DataFrame:
    if "table" in src:
        return load_table(spark, sf_dir, src["table"])
    fmt = src.get("format", "parquet")
    reader = spark.read
    if "schema" in src:
        reader = reader.schema(src["schema"])
    if fmt == "csv":
        reader = reader.option("header", src.get("header", True)).option(
            "sep", src.get("sep", ",")
        )
    return reader.format(fmt).load(src["path"])


def build_plan(spark: SparkSession, sf_dir: str, spec: dict) -> DataFrame:
    """Build the DataFrame plan described by ``spec`` (no execution)."""
    df = _source(spark, sf_dir, spec["source"])
    for op in spec.get("ops", []):
        kind = op.get("op")
        if kind == "filter":
            df = df.filter(op["condition"])
        elif kind == "select":
            df = df.selectExpr(*op["exprs"])
        elif kind == "withColumn":
            df = df.withColumn(op["name"], F.expr(op["expr"]))
        elif kind == "join":
            right = build_plan(spark, sf_dir, op["right"])
            if op.get("broadcast"):
                right = F.broadcast(right)
            df = df.join(right, op["on"], op.get("how", "inner"))
        elif kind == "groupBy":
            aggs = [F.expr(a["expr"]).alias(a["alias"]) for a in op["aggs"]]
            df = df.groupBy(*op.get("keys", [])).agg(*aggs)
        elif kind == "orderBy":
            df = df.orderBy(*[F.expr(k) for k in op["keys"]])
        elif kind == "limit":
            df = df.limit(int(op["n"]))
        elif kind == "distinct":
            df = df.distinct()
        elif kind == "dropDuplicates":
            df = df.dropDuplicates(op.get("subset"))
        else:
            raise PlanSpecError(f"unknown op: {kind!r}")
    return df
