"""SQL-surface queries (q124–q127): LATERAL correlated subqueries,
recursive CTEs, observed metrics, and parameterized SQL — Spark 3.4+/4
API surface that completes the declared §2B relational contract's
query-language surface. The SQL forms run as
``spark.sql`` text against temp views over the fixture parquet, and
the oracle is (near-)identical SQL on DuckDB — the point is that the
engine's SQL dialect surface itself matches a reference ANSI engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "q124_lateral_topn",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
""",
)
def q124_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-2 orders via a LATERAL correlated subquery —
    the dependent-join SQL surface (Spark ≥3.4 DecorrelateInnerQuery).
    Catalyst decorrelates the per-row ORDER BY/LIMIT into a ranked
    window over one shuffle on the correlation key — same physical
    plan as the explicit window form (q03), which is the scale story:
    LATERAL is surface, not a nested-loop execution commitment.
    o_totalprice passes through unaggregated, so no float-sum hazard."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        """
    )


_REACH_SEED = "table"
_REACH_HOPS = 3

_REACH_SQL = f"""
WITH RECURSIVE reach(node, d) AS (
  SELECT '{_REACH_SEED}' AS node, 0 AS d
  UNION ALL
  SELECT e.dst, r.d + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.d < {_REACH_HOPS})
SELECT node, CAST(min(d) AS BIGINT) AS dist
FROM reach GROUP BY node ORDER BY dist, node
"""

_EDGES_SQL = """
SELECT DISTINCT t[i] AS src, t[i+1] AS dst
FROM (SELECT string_split(text, ' ') AS t FROM documents) d,
     unnest(range(1, len(t))) AS u(i)
WHERE len(t) >= 2
"""


@query(
    "q125_recursive_reachability",
    oracle=f"""
WITH RECURSIVE edges AS ({_EDGES_SQL}),
reach(node, d) AS (
  SELECT '{_REACH_SEED}' AS node, 0 AS d
  UNION ALL
  SELECT e.dst, r.d + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.d < {_REACH_HOPS})
SELECT node, CAST(min(d) AS BIGINT) AS dist
FROM reach GROUP BY node ORDER BY dist, node
""",
)
def q125_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS distances (≤3 hops) from a seed token over the distinct
    bigram co-occurrence graph via WITH RECURSIVE (Spark 4 recursive
    CTE = Catalyst-managed iterative union). Depth-bounded UNION ALL +
    a final min(d) aggregate keeps termination independent of cycle
    structure — portable to any ANSI recursive-CTE engine. The
    DataFrame-loop twins (q79 connected components, q106 PageRank)
    remain the unbounded-depth scale path; the recursive CTE is their
    SQL-surface counterpart."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("src"), F.element_at(t, i + 1).alias("dst")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<src:string,dst:string>>"))
    edges = d.select(F.explode(pairs).alias("e")).select("e.src", "e.dst").distinct()
    edges.createOrReplaceTempView("edges")
    return spark.sql(_REACH_SQL)


@query(
    "q126_observe_metrics",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
""",
)
def q126_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.observe`` (Observation API): pipeline telemetry collected as
    a side effect of the SAME pass that does the work — no second scan,
    no collect of data rows. The metrics ride the existing action as
    accumulator-style aggregates; the write is the ``noop`` sink, so
    what's measured is exactly the observe machinery. At 100 TB this is
    the row-count/invariant monitor every ingest step wants for free.
    Sum in DECIMAL then cast once, so the metric is order-independent
    and the oracle can pin its exact value."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("q126")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_discounted"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), int(m["n_discounted"]), float(m["sum_qty"]))],
        "n_rows long, n_discounted long, sum_qty double",
    )


@query(
    "q127_parameterized_sql",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
FROM orders WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q127_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (Spark 3.4+ ``spark.sql(..., args=...)``):
    injection-safe binding — parameters enter the plan as typed
    literals AFTER parsing, never by string interpolation, which is the
    contract a query service needs. The oracle inlines the same
    constants."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "WHERE o_totalprice > :minprice AND o_orderstatus = :status "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
        args={"minprice": 150000, "status": "F"},
    )
