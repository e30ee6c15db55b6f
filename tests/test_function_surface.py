"""Engine-specific scalar functions that can't be oracle-compared
(q34/q38 docstrings defer them here): banker's rounding, seeded rand,
Spark-native hashes, monotonic ids, approxQuantile, schema_of_json."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bround_bankers_rounding(spark):
    rows = [(0.5,), (1.5,), (2.5,), (3.5,), (-0.5,), (2.675,)]
    df = spark.createDataFrame(rows, "x double")
    got = [r[0] for r in df.select(F.bround("x", 0)).collect()]
    # HALF_EVEN: .5 rounds to the even neighbor.
    assert got[:5] == [0.0, 2.0, 2.0, 4.0, -0.0]


def test_rand_is_seed_deterministic(spark):
    df = spark.range(100).repartition(4)
    a = [r[0] for r in df.select(F.rand(42)).collect()]
    b = [r[0] for r in df.select(F.rand(42)).collect()]
    c = [r[0] for r in df.select(F.rand(43)).collect()]
    assert sorted(a) == sorted(b)
    assert sorted(a) != sorted(c)
    assert all(0.0 <= v < 1.0 for v in a)


def test_spark_native_hashes_stable(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    row = df.select(
        F.hash("s").alias("h32"),
        F.xxhash64("s").alias("h64"),
        F.crc32("s").alias("crc"),
    ).first()
    # Stable across runs/partitionings (not across engines — hence no
    # oracle): pin the known Spark values.
    again = df.repartition(3).select(
        F.hash("s").alias("h32"),
        F.xxhash64("s").alias("h64"),
        F.crc32("s").alias("crc"),
    ).first()
    assert tuple(row) == tuple(again)
    assert row["crc"] == 891568578  # public CRC-32 of b"abc"


def test_monotonically_increasing_id_unique_and_ordered_per_partition(spark):
    df = spark.range(1000).repartition(8).withColumn("mid", F.monotonically_increasing_id())
    rows = df.select("mid").collect()
    ids = [r["mid"] for r in rows]
    assert len(set(ids)) == len(ids)  # globally unique


def test_approx_quantile_close_to_exact(spark):
    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    approx = li.approxQuantile("l_extendedprice", [0.25, 0.5, 0.75], 0.01)
    exact = list(
        li.selectExpr(
            "percentile(l_extendedprice, 0.25)",
            "percentile(l_extendedprice, 0.5)",
            "percentile(l_extendedprice, 0.75)",
        ).first()
    )
    for a, e in zip(approx, exact):
        assert abs(a - e) / e < 0.05, (approx, exact)


def test_schema_of_json(spark):
    got = spark.range(1).select(
        F.schema_of_json(F.lit('{"k": 1, "s": "x"}')).alias("sch")
    ).first()["sch"]
    assert "k" in got and "BIGINT" in got.upper() and "STRING" in got.upper()


def test_approx_aggs_bounded_error(spark):
    """q30's rows-only promise: HLL distinct within ~3x the configured
    rsd; approx percentile within 2% of exact."""
    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50a"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50e"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06
    assert abs(row["p50a"] - row["p50e"]) / row["p50e"] < 0.02


def test_df_sample_seeded_deterministic(spark):
    """Seeded bernoulli sample is reproducible for a DETERMINISTIC
    lineage (the §2B sample row). Note: through a round-robin
    repartition it is NOT (row->partition order varies per job) —
    which is exactly why q29 uses the hash-systematic variant for
    oracle comparability."""
    # Keyword args matter: positional sample(0.1, seed=7) hits the
    # withReplacement overload slot and the seed is NOT honored.
    df = spark.range(10_000)
    a = sorted(r["id"] for r in df.sample(fraction=0.1, seed=7).collect())
    b = sorted(r["id"] for r in df.sample(fraction=0.1, seed=7).collect())
    c = sorted(r["id"] for r in df.sample(fraction=0.1, seed=8).collect())
    assert a == b
    assert a != c
    assert 700 < len(a) < 1300  # fraction is approximate by design
