"""SQL-surface queries (q108–q109): LATERAL correlated subqueries and
recursive CTEs — Spark 4 SQL features that complete the declared §2B
relational contract's query-language surface. Both run as
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
    "q108_lateral_topn",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
""",
)
def q108_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "q109_recursive_reachability",
    oracle=f"WITH edges AS ({_EDGES_SQL}) , r2 AS ({_REACH_SQL.replace('WITH RECURSIVE', 'WITH RECURSIVE').strip()})"
    .replace("WITH edges AS", "WITH edges AS")  # assembled below instead
    ,
)
def q109_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
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
