"""Bucketed co-located join: writing both sides bucketed by the join
key must eliminate the join-time shuffle entirely — the 100 TB answer
to repeated fact⋈fact joins (docs/SCALE.md 'Joins')."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
from apache_hadoop_framework_for_peptide_identification_spark.sources.bucketing import (
    read_table,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    write_bucketed(li, "li_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "o_bkt", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "li_bkt", "o_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # Disable broadcast so the planner must pick a co-located join.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, li_t).join(
            read_table(spark, o_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)).alias("n"))
        .first()["n"]
    )
    bucketed = (
        read_table(spark, li_t)
        .join(read_table(spark, o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .first()["n"]
    )
    assert bucketed == plain
