#!/usr/bin/env python
"""Measure the plain-PySpark baseline for BASELINE.md.

Stock-Spark implementations of the bench headliners — NO engine imports,
no engine-specific optimizations (no table cache, no broadcast hints, no
per-row norm hoisting, no explode+agg MinHash trick). This is the code a
competent PySpark user writes first, which is exactly what the engine's
2x budget is measured against.

Config matches the bench contract: local[$SPARK_GRAFT_CPUS] (default 32)
with shuffle.partitions = cpus, at $SPARK_GRAFT_SF_DIR (default sf0.1).
Method: 1 warm-up, then best of BENCH_RUNS (default 3) collect() latency.

Usage: python scripts/measure_baseline.py
Prints one JSON line: {"config": ..., "queries": {name: sec, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def tables(spark: SparkSession, sf: str):
    t = {}
    for name in ("lineitem", "orders", "customer", "nation", "documents", "embeddings"):
        t[name] = spark.read.parquet(os.path.join(sf, f"{name}.parquet"))
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    if dict(ev.dtypes).get("ts") == "bigint":
        # nanosAsLong ingest necessity (see BASELINE.md), not an optimization.
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    t["events"] = ev
    return t


def b1_scan_filter_agg(t):
    l = t["lineitem"]
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def b2_join_revenue_topk(t):
    rev = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc())
        .limit(10)
    )
    return rev


def b3_window_topk(t):
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def b4_tumbling_hourly(t):
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )


def q40_dedup_exact(t):
    return (
        t["documents"]
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keeper_doc_id")
    )


def q42_minhash_lsh(t):
    """Naive stock-Spark MinHash-LSH: 64 signature mins each re-hashing
    the shingle array through an interpreted HOF lambda, banded 16x,
    self-join on (band, bucket). Same output contract as the engine's
    q42 (candidate pairs id_a < id_b)."""
    d = t["documents"]
    toks = F.split(F.col("text"), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
        )
    )
    sig = d.select(
        F.col("doc_id").alias("id"),
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i)))).alias(f"mh_{i}")
            for i in range(64)
        ],
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col(f"mh_{b * 4 + j}") for j in range(4)]).alias("bucket"),
                    )
                    for b in range(16)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
        .orderBy("id_a", "id_b")
    )


def q44_cosine_topk(t):
    """Brute-force cosine top-5: the direct join form (no broadcast
    hint, norms computed inline per PAIR — the first version that
    passes)."""
    emb = t["embeddings"]

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("q_vec")
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").cast("array<double>").alias("n_vec")
    )
    scored = q.join(c, F.col("q_id") != F.col("n_id")).select(
        "q_id",
        "n_id",
        (
            dot(F.col("q_vec"), F.col("n_vec"))
            / (F.sqrt(dot(F.col("q_vec"), F.col("q_vec"))) * F.sqrt(dot(F.col("n_vec"), F.col("n_vec"))))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).orderBy("q_id", "rn")


def q50_pipe_tokens(t):
    """Hadoop-streaming-style external tool: lines piped through awk via
    RDD.pipe (the stock-Spark analog of the reference's external-binary
    model)."""
    d = t["documents"].select(F.concat_ws("\t", "doc_id", "text"))
    piped = d.rdd.map(lambda r: r[0]).pipe(
        "awk -F '\\t' '{ n = split($2, a, \" \"); print $1 \"\\t\" n }'"
    )
    spark = t["documents"].sparkSession
    out = piped.map(lambda line: (int(line.split("\t")[0]), int(line.split("\t")[1])))
    return spark.createDataFrame(out, "doc_id long, n_tokens long").orderBy("doc_id")


def q67_embedding_neardup(t):
    """Stock near-dup: pyspark.ml BucketedRandomProjectionLSH
    approxSimilarityJoin on L2-normalized vectors; euclidean threshold
    sqrt(2-2*0.9) equals cosine >= 0.9 on the unit sphere. Same
    twin-planted corpus as the engine's q67 (the fixture has no true
    near-dups)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    base = t["embeddings"].select("vec_id", "embedding")
    twins = base.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (x + F.sin(i.cast("double") + F.col("vec_id")) * F.lit(0.02)).cast("float"),
        ).alias("embedding"),
    )
    corpus = base.unionByName(twins)
    emb = corpus.select(
        F.col("vec_id").alias("id"), array_to_vector(F.col("embedding").cast("array<double>")).alias("raw")
    )
    emb = Normalizer(inputCol="raw", outputCol="vec", p=2.0).transform(emb)
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=0.5, numHashTables=8, seed=42
    ).fit(emb)
    thr = float((2.0 - 2.0 * 0.9) ** 0.5)
    pairs = lsh.approxSimilarityJoin(emb, emb, thr, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            (1.0 - F.col("dist") * F.col("dist") / 2.0).alias("cos_sim"),
        )
        .orderBy("id_a", "id_b")
    )


def q83_repetition_filter(t):
    """Stock repetition filter: explode tokens -> groupBy counts for the
    top-token fraction, explode trigrams -> distinct counts for the
    duplicate-trigram fraction, join the two back (what a user writes
    first: three shuffles of every token/trigram plus a join, vs the
    engine's zero-shuffle per-row expression form)."""
    d = t["documents"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    topc = (
        tok.groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_c"), F.sum("count").alias("n_tok"))
    )
    toks = F.split(F.col("text"), " ")
    tri = d.filter(F.size(toks) >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            )
        ).alias("sh"),
    )
    trid = tri.groupBy("doc_id").agg(
        (1.0 - F.countDistinct("sh") / F.count("sh")).alias("dup_tri_frac")
    )
    top_frac = F.col("top_c") / F.col("n_tok")
    dup_frac = F.coalesce(F.col("dup_tri_frac"), F.lit(0.0))
    return (
        topc.join(trid, "doc_id", "left")
        .select(
            "doc_id",
            top_frac.alias("top_tok_frac"),
            dup_frac.alias("dup_tri_frac"),
            ((top_frac <= 0.125) & (dup_frac <= 0.05)).alias("keep"),
        )
        .orderBy("doc_id")
    )


def q100_paragraph_dedup(t):
    """Stock C4-style paragraph dedup: explode 8-token chunks, find each
    chunk's keeper occurrence with a groupBy-min + join back, then
    reassemble (the dropDuplicates-shaped form a user writes first:
    TWO chunk-keyed shuffles plus a chunk join, vs the engine's single
    window pass over one chunk shuffle). Same planted boilerplate as
    the engine query so the workloads are identical."""
    d = t["documents"]
    boiler = "subscribe to our newsletter for updates and offers"
    planted = F.when(
        F.col("doc_id") % 4 == 0, F.concat(F.lit(boiler + " "), F.col("text"))
    ).otherwise(F.col("text"))
    toks = F.split(planted, " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(8)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * 8 + 1, 8)),
    )
    chunks = d.select(
        "doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk")
    )
    keeper = chunks.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("k")
    )
    tagged = chunks.join(keeper, "chunk").withColumn(
        "kept",
        (F.col("k.doc_id") == F.col("doc_id"))
        & (F.col("k.chunk_idx") == F.col("chunk_idx")),
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum((~F.col("kept")).cast("long")).alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("chunk_idx", "chunk"))
                        )
                    ),
                    lambda s: s["chunk"],
                ),
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "q01_scan_filter_agg": b1_scan_filter_agg,
    "q02_join_revenue_topk": b2_join_revenue_topk,
    "q03_window_topk_per_group": b3_window_topk,
    "q04_tumbling_hourly": b4_tumbling_hourly,
    "q40_dedup_exact": q40_dedup_exact,
    "q42_dedup_minhash_lsh": q42_minhash_lsh,
    "q44_ann_cosine_topk": q44_cosine_topk,
    "q50_pipe_tokens": q50_pipe_tokens,
    "q67_embedding_neardup_lsh": q67_embedding_neardup,
    "q83_repetition_filter": q83_repetition_filter,
    "q100_paragraph_dedup": q100_paragraph_dedup,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("baseline")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:] or list(QUERIES)
    timings = {}
    for name in only:
        fn = QUERIES[name]
        fn(tables(spark, sf_dir)).collect()  # warm-up
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(tables(spark, sf_dir)).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(json.dumps({"config": f"local[{cpus}]/shuffle={cpus}", "sf_dir": sf_dir, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
