"""Window functions, sort/limit/top-k, set ops, sampling, approx aggs
(SURVEY.md §2B tables 4-6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q22_window_ranking",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       row_number()   OVER w AS rn,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cum_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_orderstatus, rn
""",
)
def q22_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window family. Deterministic order spec (tie-break on
    o_orderkey) so rank == row_number and the oracle agrees exactly."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    ).orderBy("o_orderstatus", "rn")


@query(
    "q23_window_analytic",
    oracle="""
SELECT event_id, user_id,
       lag(value)  OVER w                                           AS prev_value,
       lead(value) OVER w                                           AS next_value,
       first_value(value) OVER w                                    AS first_val,
       last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING)            AS last_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""",
)
def q23_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window family: lag/lead/first_value/last_value (full-frame
    last_value needs the unbounded-following frame in both engines)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(wfull).alias("last_val"),
    ).orderBy("event_id")


@query(
    "q24_window_running",
    oracle="""
SELECT o_orderkey, o_custkey,
       sum(o_totalprice)   OVER w AS running_spend,
       count(*)            OVER w AS running_n,
       avg(o_totalprice)   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
""",
)
def q24_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/moving aggregates over ROWS frames — streaming per
    partition, constant memory per frame."""
    o = _t(spark, sf_dir, "orders")
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    w3 = base.rowsBetween(-2, W.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum("o_totalprice").over(w).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.avg("o_totalprice").over(w3).alias("moving_avg_3"),
    ).orderBy("o_orderkey")


@query(
    "q25_window_range",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
FROM orders
ORDER BY o_orderkey
""",
)
def q25_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs ROWS physical) — peers within a
    10k price band."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_in_band"),
    ).orderBy("o_orderkey")


@query(
    "q26_sort_nulls",
    oracle="""
SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null, o_totalprice
FROM orders
ORDER BY status_or_null DESC NULLS LAST, o_totalprice DESC, o_orderkey
""",
)
def q26_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    ).orderBy(
        F.col("status_or_null").desc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )


@query(
    "q27_global_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
""",
)
def q27_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: plans as TakeOrderedAndProject — per-partition
    k-heaps merged on the driver; no full sort at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@query(
    "q28_set_ops",
    oracle="""
WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
     b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
UNION ALL
SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
UNION ALL
SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
UNION ALL
SELECT 'intersect_all' AS op, k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'except_all' AS op, k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
ORDER BY op, k
""",
)
def q28_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union/intersect/except plus INTERSECT ALL / EXCEPT ALL multiset\n    variants, tagged into one result."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    b = (
        o.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    # Multisets (duplicates preserved) for the _all variants.
    ma = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("k"))
    mb = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    tagged = (
        a.unionByName(b).distinct().select(F.lit("union").alias("op"), "k")
        .unionByName(a.intersect(b).select(F.lit("intersect").alias("op"), "k"))
        .unionByName(a.exceptAll(b).distinct().select(F.lit("except").alias("op"), "k"))
        .unionByName(ma.intersectAll(mb).select(F.lit("intersect_all").alias("op"), "k"))
        .unionByName(ma.exceptAll(mb).select(F.lit("except_all").alias("op"), "k"))
    )
    return tagged.orderBy("op", "k")


@query(
    "q29_systematic_sample",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_orderkey % 20 = 3
ORDER BY l_orderkey, l_linenumber
""",
)
def q29_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sample (key mod N) — reproducible across
    engines, unlike seeded bernoulli sampling which is RNG-specific
    (df.sample(fraction, seed) is exercised in unit tests instead)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 20 == 3)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q30_approx_aggs",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS hll_ok, TRUE AS median_ok, TRUE AS p95_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def q30_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, t-digest-style quantiles)
    verified through their error CONTRACTS (the q111 bounds pattern —
    sketch values are engine-specific, sketch GUARANTEES are not):
    HLL(rsd=0.02) must land within 3·rsd of the exact distinct count,
    and percentile_approx(accuracy=10000) must land between the exact
    0.45/0.55 (resp. 0.94/0.96) quantiles — the rank-error guarantee is
    n/accuracy, far inside those windows. The oracle pins the exact
    distinct counts and asserts all bounds hold, turning the r1
    rows-only verdict into a hash verdict."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("am"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("ap95"),
        F.percentile("l_extendedprice", F.lit(0.45)).alias("p45"),
        F.percentile("l_extendedprice", F.lit(0.55)).alias("p55"),
        F.percentile("l_extendedprice", F.lit(0.94)).alias("p94"),
        F.percentile("l_extendedprice", F.lit(0.96)).alias("p96"),
    )
    err = F.abs(F.col("approx_parts") - F.col("exact_parts"))
    return agg.select(
        "l_returnflag",
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        (err <= 3 * 0.02 * F.col("exact_parts")).alias("hll_ok"),
        F.col("am").between(F.col("p45"), F.col("p55")).alias("median_ok"),
        F.col("ap95").between(F.col("p94"), F.col("p96")).alias("p95_ok"),
    ).orderBy("l_returnflag")


@query(
    "q123_hll_sketch_union",
    oracle="""
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
       TRUE AS hll_ok
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT '__ALL__', CAST(count(DISTINCT o_custkey) AS BIGINT), TRUE
FROM orders
ORDER BY o_orderpriority
""",
)
def q123_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HLL sketches (Spark 3.5+ Datasketches functions — the
    capability approx_count_distinct lacks): per-group sketches built
    with hll_sketch_agg, then re-aggregated WITHOUT rescanning the data
    via hll_union_agg — the shape a 100 TB rollup cube needs, where
    per-partition sketches merge up a hierarchy instead of re-reading
    rows. Verified through the error contract (q30/q111 pattern): each
    group estimate AND the union-of-sketches estimate must land within
    3·1.04/√2^lgK of its exact distinct count; the union row
    additionally proves merge associativity end to end (a lossy merge
    under-counts and breaks the bound). lgK=14 → 3σ ≈ 2.4%."""
    lg_k = 14
    rel = 3 * 1.04 / (2 ** (lg_k / 2))
    o = _t(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", F.lit(lg_k)).alias("sk"),
        F.count_distinct("o_custkey").alias("exact_custs"),
    )
    groups = per_group.select(
        "o_orderpriority",
        F.col("exact_custs").cast("bigint").alias("exact_custs"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_custs"))
            <= rel * F.col("exact_custs")
        ).alias("hll_ok"),
    )
    global_exact = o.agg(F.count_distinct("o_custkey").alias("exact_custs"))
    union_row = (
        per_group.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est")
        )
        .crossJoin(global_exact)  # single row × single row
        .select(
            F.lit("__ALL__").alias("o_orderpriority"),
            F.col("exact_custs").cast("bigint").alias("exact_custs"),
            (
                F.abs(F.col("union_est") - F.col("exact_custs"))
                <= rel * F.col("exact_custs")
            ).alias("hll_ok"),
        )
    )
    return groups.unionByName(union_row).orderBy("o_orderpriority")


@query(
    "q31_exact_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5)       AS median_qty,
       quantile_cont(l_extendedprice, 0.9)  AS p90_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def q31_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use linear
    interpolation — matches to float precision)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q155_bitmap_distinct_rollup",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q155_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via bitmap aggregates — the
    third tier of the rollup fabric (q123 HLL: approximate distinct;
    q150 frequent-items: heavy hitters; this: exact distinct when the
    id domain is dense enough to afford 4 KiB per 32k-id bucket).
    Level 1 builds per-(event_type, day, bucket) bitmaps of user ids
    — bitmap_bucket_number shards the id domain so each bitmap stays
    a fixed 32768 bits; level 2 rolls daily bitmaps up to event_type
    by bitmap_or_agg WITHOUT rescanning events, and the final count is
    the sum of per-bucket popcounts. At 100 TB the daily bitmap table
    is the materialized layer: any slice's exact distinct users is an
    OR+popcount over bitmaps, never a re-scan, and unlike HLL the
    rollup is exactly re-aggregatable along every dimension. The
    oracle is the plain count(DISTINCT) — exactness IS the contract."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        F.col("user_id").alias("uid"),
    )
    daily = ev.groupBy(
        "event_type", "d", F.expr("bitmap_bucket_number(uid)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"))
    rolled = daily.groupBy("event_type", "bkt").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    return (
        rolled.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_users"))
        .orderBy("event_type")
    )


@query(
    "q156_histogram_quantile_rollup",
    oracle="""
WITH h AS (
  SELECT l_returnflag, CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bin,
         count(*) AS n
  FROM lineitem GROUP BY 1, 2),
c AS (
  SELECT l_returnflag, bin, n,
         sum(n) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum_n,
         sum(n) OVER (PARTITION BY l_returnflag) AS tot
  FROM h),
m AS (
  SELECT l_returnflag, min(bin) AS med_bin
  FROM c WHERE cum_n * 2 >= tot GROUP BY l_returnflag),
e AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS exact_p50
  FROM lineitem GROUP BY 1)
SELECT m.l_returnflag,
       CAST((med_bin + 0.5) * 1000 AS DOUBLE) AS est_p50,
       e.exact_p50,
       (abs((med_bin + 0.5) * 1000 - e.exact_p50) <= 1000.0) AS within_bin
FROM m JOIN e ON m.l_returnflag = e.l_returnflag
ORDER BY m.l_returnflag
""",
)
def q156_histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE tier of the rollup fabric (q123 HLL ≈
    distinct, q155 bitmap = exact distinct, q150 frequent items; Spark
    exposes percentile_approx but not its sketch as a mergeable
    column, so this tier is hand-rolled from fixed-width histograms —
    which merge EXACTLY by summing bin counts): level 1 builds
    per-(flag, ship-month, bin) counts, level 2 merges months per flag
    WITHOUT rescanning lineitem, and the median estimate is the
    midpoint of the first bin whose doubled cumulative count reaches
    the total (integer comparison — no float rank math to diverge).
    The ORACLE builds the histogram in ONE level; matching hashes
    prove the two-level merge is lossless, which is the mergeability
    contract itself. Error bound, stated precisely: the LOWER median
    (the ⌈n/2⌉-th value) always lies inside med_bin, so the midpoint
    estimate is within half a bin of IT; the interpolated median can
    drift further only when n is even and the two middle values land
    in different bins (sparse data straddling a bin edge) — so the
    query emits the exact median and a within_bin flag, making the
    realized error reported data (identical on both engines), not an
    assumed invariant. At 100 TB
    the month-level histogram table is the materialized layer: any slice's
    quantiles come from summing ≤nbins longs per group, never a
    re-sort of raw data; bin width is the precision/size knob."""
    li = _t(spark, sf_dir, "lineitem")
    binned = li.select(
        "l_returnflag",
        F.date_trunc("month", "l_shipdate").alias("m"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("bin"),
    )
    monthly = binned.groupBy("l_returnflag", "m", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    merged = monthly.groupBy("l_returnflag", "bin").agg(F.sum("n").alias("n"))
    w_cum = W.partitionBy("l_returnflag").orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = merged.select(
        "l_returnflag",
        "bin",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(W.partitionBy("l_returnflag")).alias("tot"),
    )
    med_bin = (
        cum.filter(F.col("cum_n") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("bin").alias("med_bin"))
    )
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50")
    )
    est = (F.col("med_bin") + 0.5) * 1000
    return (
        med_bin.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            est.cast("double").alias("est_p50"),
            "exact_p50",
            (F.abs(est - F.col("exact_p50")) <= 1000.0).alias("within_bin"),
        )
        .orderBy("l_returnflag")
    )
