"""Scale smoke (SURVEY.md §5.2 item 6): run the shuffle-heavy LLM
operators on a corpus ~20x the sf0.1 fixture (100k docs built by
perturbed replication) and assert structural invariants — completion,
plausible outputs, and the duplicate-recovery property that motivates
the operators in the first place. No wall-clock assertions (timing
belongs to bench.py); this catches O(n^2) blowups and per-task
serialization by simply not finishing if they appear."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
from apache_hadoop_framework_for_peptide_identification_spark.operators import dedup

REPLICAS = 20  # 5000 fixture docs -> 100k


@pytest.fixture(scope="module")
def big_docs(spark):
    """documents x REPLICAS: copy r of doc d gets id d*1000+r. Copy 0
    is verbatim; copies r>0 get r extra marker words appended — so
    every replica family is a true near-duplicate cluster."""
    d = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    r = spark.range(REPLICAS).select(F.col("id").alias("r"))
    return (
        d.crossJoin(r)
        .select(
            (F.col("doc_id") * 1000 + F.col("r")).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.col("text"),
                    F.concat(F.lit("marker"), F.col("r").cast("string")),
                )
            )
            .alias("text"),
        )
        .repartition(32)
    )


def test_exact_dedup_at_100k(big_docs):
    """Verbatim copies exist only where fixture texts collide; every
    (doc, r>0) suffix makes rows unique -> dedup keeps ~all rows, and
    keeps exactly one row per distinct text."""
    total = big_docs.count()
    assert total == 5000 * REPLICAS
    kept = dedup.exact_dedup(big_docs, ["text"], "doc_id")
    distinct_texts = big_docs.select("text").distinct().count()
    assert kept.count() == distinct_texts


def test_minhash_lsh_at_100k_finds_replica_clusters(big_docs):
    """MinHash-LSH over 100k docs completes and recovers the planted
    replica families: a (d*1000+r1, d*1000+r2) candidate pair shares
    the same base doc. Check recall on a sample of families and that
    cross-family false candidates stay rare."""
    cands = dedup.minhash_lsh_candidates(
        big_docs.filter(F.col("doc_id") < 200 * 1000 + REPLICAS),  # 200 families, 4k docs
        "doc_id",
        "text",
        num_hashes=64,
        bands=16,
        shingle_n=3,
    )
    pairs = [(r["id_a"], r["id_b"]) for r in cands.collect()]
    same_family = [p for p in pairs if p[0] // 1000 == p[1] // 1000]
    # Each of the 200 families should connect: near-dup copies differ
    # by one trailing marker word -> Jaccard ~0.98 -> recall ~1.
    families_hit = {p[0] // 1000 for p in same_family}
    assert len(families_hit) >= 190, f"only {len(families_hit)} families connected"
    # False-positive discipline: cross-family pairs can only come from
    # genuinely colliding fixture texts, not LSH noise.
    cross = [p for p in pairs if p[0] // 1000 != p[1] // 1000]
    assert len(cross) <= len(pairs) * 0.5, f"{len(cross)}/{len(pairs)} cross-family pairs"


def test_salted_agg_at_100k(big_docs):
    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import salted_agg

    lang = big_docs.select(
        (F.col("doc_id") % 3).alias("k"), F.length("text").cast("double").alias("v"), "doc_id"
    )
    plain = {
        r["k"]: r["s"]
        for r in lang.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r["k"]: r["s"]
        for r in salted_agg(
            lang, ["k"], [("sum", "v", "s")], salt_cols=["doc_id"], buckets=32
        ).collect()
    }
    assert salted == plain
