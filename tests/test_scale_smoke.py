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


def test_repetition_filter_at_100k(big_docs):
    """One Arrow pass over 100k docs: completes, every fraction in
    [0,1] — catches accidental quadratic re-introduction (the
    expression form was 40x slower at 5k docs; it would never finish
    here inside the suite budget)."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    stats = big_docs.select("doc_id", P.repetition_stats(F.col("text")).alias("s"))
    agg = stats.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("s")["top_tok_frac"]).alias("lo"),
        F.max(F.col("s")["top_tok_frac"]).alias("hi"),
    ).collect()[0]
    assert agg["n"] == 5000 * REPLICAS
    assert 0.0 < agg["lo"] <= agg["hi"] <= 1.0


def test_epoch_shuffle_at_100k_is_a_permutation(big_docs):
    """Distributed global rank over 100k rows: positions must be exactly
    1..N with no collisions (the offsets-per-partition arithmetic is
    the part that breaks silently)."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    out = P.epoch_shuffle(big_docs.select("doc_id"), "doc_id", epoch=3)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("pos").alias("npos"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
    ).collect()[0]
    n = 5000 * REPLICAS
    assert (stats["n"], stats["npos"], stats["lo"], stats["hi"]) == (n, n, 1, n)


def test_sequence_packing_at_100k(big_docs):
    """Greedy packing across 100k docs sharded 32 ways: completes with
    O(1) state per shard; every bin respects the budget (or holds one
    oversize doc)."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    sized = big_docs.select(
        (F.col("doc_id") % 32).alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    packed = P.pack_sequences(sized, "shard", "doc_id", "n_tok", budget=2048)
    over = (
        packed.groupBy("shard", "seq_id")
        .agg(F.sum("n_tok").alias("tot"), F.count(F.lit(1)).alias("m"))
        .filter((F.col("tot") > 2048) & (F.col("m") > 1))
        .count()
    )
    assert over == 0
    assert packed.count() == 5000 * REPLICAS


def test_simhash_blocked_pairs_at_100k(big_docs):
    """The q120 machinery at 100k docs: portable signatures (one md5
    per token, JVM-side) + 4-block banded join must complete without
    an all-pairs blowup, and every replica family's verbatim copy
    pair (r=0 vs r=1 — one appended marker word, minimal signature
    drift) should largely land within hamming 3 — near-dup recovery,
    the property the operator exists for."""
    pairs = dedup.simhash_blocked_pairs(
        big_docs, "doc_id", "text", max_hamming=3, n_blocks=4
    )
    fam = (
        pairs.filter(
            (F.col("id_a") % 1000 < 2)
            & (F.col("id_b") % 1000 < 2)
            & (F.col("id_a") / 1000).cast("long").eqNullSafe(
                (F.col("id_b") / 1000).cast("long")
            )
        )
        .count()
    )
    assert fam >= 2000, f"only {fam}/5000 r0-r1 family pairs within hamming 3"
