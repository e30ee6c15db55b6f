"""Declarative relational plan spec tests: spec'd plans must equal the
hand-coded DataFrame plans, and unknown ops fail loudly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
from apache_hadoop_framework_for_peptide_identification_spark.plans.relational_spec import (
    PlanSpecError,
    build_plan,
)

SF = "/root/testdata/sf0.001"


def test_spec_equals_coded_plan(spark):
    spec = {
        "source": {"table": "orders"},
        "ops": [
            {"op": "filter", "condition": "o_totalprice > 100000"},
            {
                "op": "groupBy",
                "keys": ["o_orderstatus"],
                "aggs": [{"expr": "count(*)", "alias": "n"}],
            },
            {"op": "orderBy", "keys": ["o_orderstatus"]},
        ],
    }
    got = build_plan(spark, SF, spec).collect()
    o = load_table(spark, SF, "orders")
    expected = (
        o.filter(F.col("o_totalprice") > 100000)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
        .collect()
    )
    assert got == expected


def test_spec_nested_join_and_limit(spark):
    spec = {
        "source": {"table": "nation"},
        "ops": [
            {
                "op": "join",
                "right": {"source": {"table": "region"}, "ops": [
                    {"op": "select", "exprs": ["r_regionkey AS n_regionkey", "r_name"]}
                ]},
                "on": ["n_regionkey"],
                "broadcast": True,
            },
            {"op": "select", "exprs": ["n_name", "r_name"]},
            {"op": "orderBy", "keys": ["n_name"]},
            {"op": "limit", "n": 5},
        ],
    }
    rows = build_plan(spark, SF, spec).collect()
    assert len(rows) == 5
    assert all(r["r_name"] is not None for r in rows)


def test_unknown_op_raises(spark):
    with pytest.raises(PlanSpecError, match="unknown op"):
        build_plan(spark, SF, {"source": {"table": "region"}, "ops": [{"op": "pivot3d"}]})
