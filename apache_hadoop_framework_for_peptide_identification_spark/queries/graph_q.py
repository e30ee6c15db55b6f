"""Graph-analytics queries (q106): TextRank keyword extraction —
weighted PageRank over the corpus token co-occurrence graph
(operators/graph.py). The iterative-fixed-point family: the driver
loops over PLANS (one join + one partial-agg groupBy per iteration),
never over data, and the integer-exact recurrence lets a mechanically
unrolled DuckDB oracle hash-match all 10 iterations bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import graph as G
from . import query

_ITERS = 10
_TOPK = 20

_EDGES_CTE = """
  SELECT t[i] AS src, t[i+1] AS dst, count(*) AS w
  FROM (SELECT string_split(text, ' ') AS t FROM documents) d,
       unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
  GROUP BY 1, 2"""


@query(
    "q106_textrank_keywords",
    oracle=G.pagerank_oracle_sql(_EDGES_CTE, iters=_ITERS)
    + f"\nORDER BY rank_int DESC, node LIMIT {_TOPK}",
)
def q106_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank (Mihalcea 2004): rank tokens by weighted PageRank over
    the directed bigram co-occurrence graph, top-20 keywords. Ten
    integer-exact iterations — see operators/graph.py for the
    determinism/overflow contract and the per-iteration scale shape."""
    from ..operators.corpus import bigram_partial_counts

    d = load_table(spark, sf_dir, "documents")
    # Edge build rides the Arrow-batched bigram Counter (round-5: 6.5x
    # the interpreted-HOF struct explode) and splits src/dst only AFTER
    # the count collapses to one row per distinct bigram. Tokens are
    # space-split, so the first space in the bigram is the separator.
    edges = (
        bigram_partial_counts(d, "text")
        .groupBy("bigram")
        .agg(F.sum("n_part").alias("w"))
        .select(
            F.substring_index("bigram", " ", 1).alias("src"),
            F.substring_index("bigram", " ", -1).alias("dst"),
            "w",
        )
    )
    # broadcast_ranks: the rank table here is one row per DISTINCT
    # TOKEN — vocabulary-bounded, far under the broadcast ceiling at
    # any corpus size — so the edge list never re-shuffles across the
    # 10 iterations (operators/graph.py rationale + measurement).
    ranks = G.pagerank_int(edges, "src", "dst", "w", iters=_ITERS, broadcast_ranks=True)
    return ranks.orderBy(F.col("rank_int").desc(), "node").limit(_TOPK)


@query(
    "q133_triangle_count",
    oracle="""
WITH bi AS (
  SELECT t[i] AS x, t[i+1] AS y
  FROM (SELECT string_split(text, ' ') AS t FROM documents) d,
       unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2),
und AS (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM bi WHERE x <> y),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY node),
o AS (
  SELECT CASE WHEN (da.deg, a) < (db.deg, b) THEN a ELSE b END AS u,
         CASE WHEN (da.deg, a) < (db.deg, b) THEN b ELSE a END AS v,
         CASE WHEN (da.deg, a) < (db.deg, b) THEN db.deg ELSE da.deg END AS dv
  FROM und JOIN deg da ON da.node = a JOIN deg db ON db.node = b),
w AS (
  SELECT o1.v AS v1, o2.v AS v2
  FROM o o1 JOIN o o2 ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)),
tri AS (
  SELECT count(*) AS n_triangles
  FROM w JOIN o ON o.u = w.v1 AND o.v = w.v2)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles
FROM tri
""",
)
def q133_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count over the undirected bigram co-occurrence
    graph — degree-oriented enumeration (operators/graph.py
    triangle_count): each triangle found exactly once as a wedge from
    its lowest-(degree, node) corner, closed by one equi-join. The
    oracle replays the identical orientation with SQL tuple
    comparisons, so the hash match verifies the orientation logic
    (where every off-by-one double- or zero-counts), not just the
    total. Completes the graph family: q79 components, q106 PageRank,
    this for local clustering structure."""
    from ..operators.corpus import bigram_partial_counts
    from ..operators.graph import triangle_count

    d = load_table(spark, sf_dir, "documents")
    edges = (
        bigram_partial_counts(d, "text")
        .groupBy("bigram")
        .agg(F.sum("n_part").alias("w"))
        .select(
            F.substring_index("bigram", " ", 1).alias("src"),
            F.substring_index("bigram", " ", -1).alias("dst"),
        )
    )
    return triangle_count(edges, "src", "dst")
