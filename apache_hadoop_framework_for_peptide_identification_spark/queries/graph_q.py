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
    ranks = G.pagerank_int(edges, "src", "dst", "w", iters=_ITERS)
    return ranks.orderBy(F.col("rank_int").desc(), "node").limit(_TOPK)
