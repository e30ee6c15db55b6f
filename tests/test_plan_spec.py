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


def test_catalog_load_all_and_register_views(spark):
    """Catalog helpers: load_all returns every fixture table; the SQL
    surface works against registered views (events ts normalized)."""
    from apache_hadoop_framework_for_peptide_identification_spark.catalog import (
        TABLES,
        load_all,
        register_views,
    )

    tables = load_all(spark, SF)
    assert set(tables) == set(TABLES)
    register_views(spark, SF, suffix="_v")
    n = spark.sql("SELECT count(*) AS n FROM lineitem_v").first()["n"]
    assert n == tables["lineitem"].count() > 0
    ts_type = dict(spark.sql("SELECT ts FROM events_v").dtypes)["ts"]
    assert ts_type == "timestamp"


def test_cli_malformed_or_missing_spec_exits_2(tmp_path):
    """A spec path that is unreadable or not JSON must produce a clean
    one-line diagnostic + exit 2 (the usage-error class), not a
    traceback — probed in the r8 verify session."""
    from apache_hadoop_framework_for_peptide_identification_spark.plans.spec import main

    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert main(["tok", str(bad)]) == 2
    assert main(["tok", str(tmp_path / "nope.json")]) == 2
