"""UDF / UDAF / UDTF surface (SURVEY.md §2B UDF table): one
oracle-verified query per extension-point row. These exist to prove
the Python extension boundary end-to-end — schema declaration, Arrow
batch transfer, worker-side package shipping — NOT as the recommended
way to compute these particular answers (each docstring notes the
built-in that would beat the UDF; the hot path belongs JVM-side).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from . import query


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q60_scalar_udf",
    oracle="""
SELECT CASE WHEN l_discount >= 0.05 THEN 'high' ELSE 'low' END AS band,
       count(*) AS n, sum(l_extendedprice) AS sum_price
FROM lineitem GROUP BY 1 ORDER BY 1
""",
)
def q60_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (the discouraged path — shown
    for surface completeness; q61 is the vectorized form and
    F.when the JVM form that should win at scale)."""

    @F.udf("string")
    def band(d):
        return "high" if d is not None and d >= 0.05 else "low"

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(band("l_discount").alias("band"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("sum_price"))
        .orderBy("band")
    )


@query(
    "q61_pandas_udf_charge",
    oracle="""
SELECT l_returnflag,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge
FROM lineitem GROUP BY 1 ORDER BY 1
""",
)
def q61_pandas_udf_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow batch transfer): charge =
    price*(1-disc)*(1+tax) computed on pandas Series. ~10-100x the
    row-at-a-time form; still loses to pure column arithmetic."""

    @pandas_udf("double")
    def charge(p: pd.Series, d: pd.Series, t: pd.Series) -> pd.Series:
        return p * (1 - d) * (1 + t)

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("c", charge("l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag")
        .agg(F.sum("c").alias("sum_charge"))
        .orderBy("l_returnflag")
    )


@query(
    "q62_grouped_map_zscore",
    oracle="""
WITH z AS (
  SELECT l_returnflag, l_linestatus,
         (l_quantity - avg(l_quantity) OVER w) / stddev_samp(l_quantity) OVER w AS z
  FROM lineitem
  WINDOW w AS (PARTITION BY l_returnflag, l_linestatus))
SELECT l_returnflag, l_linestatus, max(abs(z)) AS max_abs_z, count(*) AS n
FROM z GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q62_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per (returnflag, linestatus) group,
    z-score l_quantity with pandas then reduce to max|z| per group.
    Shuffles the whole group to one worker — correct only because
    group cardinality is bounded (window functions are the unbounded
    alternative, see the oracle)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        z = (pdf.l_quantity - pdf.l_quantity.mean()) / pdf.l_quantity.std(ddof=1)
        return pd.DataFrame(
            {
                "l_returnflag": [pdf.l_returnflag.iloc[0]],
                "l_linestatus": [pdf.l_linestatus.iloc[0]],
                "max_abs_z": [float(z.abs().max())],
                "n": [len(pdf)],
            }
        )

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .applyInPandas(
            zscore,
            "l_returnflag string, l_linestatus string, max_abs_z double, n bigint",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q63_grouped_agg_udaf",
    oracle="""
SELECT l_returnflag,
       sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wavg_price
FROM lineitem GROUP BY 1 ORDER BY 1
""",
)
def q63_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: quantity-weighted average price per
    return flag. NOTE the scale caveat — a grouped-agg pandas UDF has
    no partial aggregation (full group data crosses to Python);
    the sum()/sum() decomposition in the oracle is the 100 TB form."""

    @pandas_udf("double")
    def wavg(p: pd.Series, q: pd.Series) -> float:
        return float((p * q).sum() / q.sum())

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(wavg("l_extendedprice", "l_quantity").alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@query(
    "q64_map_in_pandas",
    oracle="""
SELECT count(*) AS n,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            / 100.0 AS DOUBLE) AS sum_rev
FROM lineitem
WHERE l_extendedprice * (1 - l_discount) > 2000
""",
)
def q64_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas partition-batch transform: per Arrow batch, compute
    revenue and pre-filter/pre-aggregate IN PYTHON, emitting one
    partial row per batch that the JVM combines — the map-side-combine
    discipline that keeps a Python stage viable at scale.

    The partial is kept INTEGRAL (floor'd cent units): a float partial
    sum re-combined across batches is summation-order-dependent, so two
    runs (or engine vs oracle) can disagree in the last digits —
    integer partials make the combine exact and order-independent.
    Both sides floor the same IEEE-754 product, so the unit values are
    bit-identical."""

    import numpy as np

    def per_batch(batches):
        for pdf in batches:
            rev = pdf.l_extendedprice * (1 - pdf.l_discount)
            keep = rev[rev > 2000]
            units = np.floor(keep.to_numpy() * 100).astype("int64")
            yield pd.DataFrame({"pn": [len(keep)], "pu": [int(units.sum())]})

    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_discount")
    partials = li.mapInPandas(per_batch, "pn bigint, pu bigint")
    return partials.agg(
        F.sum("pn").alias("n"),
        (F.sum("pu") / F.lit(100.0)).cast("double").alias("sum_rev"),
    )


@query(
    "q65_python_udtf",
    oracle="""
SELECT t.w AS word, count(*) AS n
FROM (SELECT text FROM documents WHERE doc_id < 20) d,
     unnest(list_filter(string_split(d.text, ' '), x -> len(x) > 0)) AS t(w)
GROUP BY 1 ORDER BY 1
""",
)
def q65_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, row → rows): tokenize document
    text via a lateral join. The built-in equivalent is
    explode(split(...)) — the UDTF exists for logic too imperative
    for SQL lambdas."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string")
    class Words:
        def eval(self, text: str):
            for w in (text or "").split(" "):
                if w:
                    yield (w,)

    spark.udtf.register("words_udtf", Words)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).select("text")
    docs.createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        """
        SELECT t.word, count(*) AS n
        FROM docs_udtf_v, LATERAL words_udtf(text) t
        GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "q78_windowed_udaf",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       sum(o_totalprice) OVER (PARTITION BY o_custkey) / count(*) OVER (PARTITION BY o_custkey)
           AS cust_avg_price
FROM orders WHERE o_custkey < 50 ORDER BY o_orderkey
""",
)
def q78_windowed_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF applied OVER A WINDOW (the §2B
    'usable over windows' clause): per-customer mean attached to every
    row without collapsing the frame."""
    from pyspark.sql import Window

    @pandas_udf("double")
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    w = Window.partitionBy("o_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        mean_udaf("o_totalprice").over(w).alias("cust_avg_price"),
    ).orderBy("o_orderkey")


@query(
    "q152_arrow_native_udfs",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders WHERE o_totalprice > 1000 GROUP BY 1 ORDER BY 1
""",
)
def q152_arrow_native_udfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-NATIVE extension boundary (mapInArrow + applyInArrow —
    until now mapInArrow was pytest-only and applyInArrow uncovered):
    pyarrow RecordBatches/Tables cross the worker boundary with NO
    pandas materialization, the zero-copy tier below
    mapInPandas/applyInPandas for payloads pandas would mangle or copy
    (binary blobs, large nested arrays — the multimodal columns' lane).
    mapInArrow filters batches with pyarrow.compute; applyInArrow then
    aggregates each status group from one pa.Table. Sums go through
    integer CENTS (portable floor(x*100 + 0.5), the q90 rounding
    discipline) so the per-group totals are order-independent exact
    integers — matching the oracle's DECIMAL sum cast to double once.
    A built-in filter + decimal groupBy beats this — the row exists to
    pin the Arrow-native contract end to end."""
    o = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")

    def flt(batches):
        import pyarrow.compute as pc

        for b in batches:
            yield b.filter(pc.greater(b.column("o_totalprice"), 1000.0))

    filtered = o.mapInArrow(flt, "o_orderstatus string, o_totalprice double")

    def agg(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        cents = pc.floor(
            pc.add(pc.multiply(table.column("o_totalprice"), 100.0), 0.5)
        ).cast(pa.int64())
        total = pc.sum(cents).as_py() or 0
        return pa.table(
            {
                "o_orderstatus": [table.column("o_orderstatus")[0].as_py()],
                "n_orders": [table.num_rows],
                "total_price": [total / 100.0],
            }
        )

    return (
        filtered.groupBy("o_orderstatus")
        .applyInArrow(agg, "o_orderstatus string, n_orders long, total_price double")
        .orderBy("o_orderstatus")
    )


@query(
    "q154_udtf_table_argument",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang ORDER BY lang
""",
)
def q154_udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument + PARTITION BY / ORDER BY
    (Spark 3.5+/4.x — q65 covered the scalar-argument lateral form):
    the SQL-native custom per-group operator. Spark instantiates the
    UDTF once per partition key, streams that key's rows through
    eval() in the declared ORDER BY, and terminate() emits the
    per-group result — applyInPandas semantics, but reachable from
    pure SQL and streaming group order instead of materializing the
    group (O(1) state here vs the whole-group pandas frame). The
    first_doc_id output pins the ORDER BY contract (it must equal
    min(doc_id) only if rows really arrive doc_id-ascending); counts
    and token totals pin per-key instance isolation — any row leaking
    across keys breaks both engines' agreement."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n_docs bigint, first_doc_id bigint, total_tokens bigint")
    class LangStats:
        def __init__(self):
            self._lang = None
            self._n = 0
            self._first = None
            self._tokens = 0

        def eval(self, row):
            self._lang = row["lang"]
            self._n += 1
            if self._first is None:
                self._first = row["doc_id"]
            # NULL text contributes 0 tokens — the oracle's
            # sum(len(string_split(text,' '))) skips NULLs, and
            # ('' or '').split(' ') would count 1 (r7 ADVICE item 3;
            # unreachable in today's fixtures, guarded for regeneration).
            if row["text"] is not None:
                self._tokens += len(row["text"].split(" "))

        def terminate(self):
            if self._n:
                yield (self._lang, self._n, self._first, self._tokens)

    spark.udtf.register("lang_stats_udtf", LangStats)
    _t(spark, sf_dir, "documents").select(
        "lang", "doc_id", "text"
    ).createOrReplaceTempView("docs_for_udtf_v")
    return spark.sql(
        """
        SELECT lang, n_docs, first_doc_id, total_tokens
        FROM lang_stats_udtf(
            TABLE(docs_for_udtf_v) PARTITION BY lang ORDER BY doc_id)
        ORDER BY lang
        """
    )
