"""Training-pipeline operator tests: repetition stats, PII scrubbing,
contamination overlap, deterministic stratified sampling, sequence
packing — planted positives AND negatives for each."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P


def _one_text(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_top_token_frac(spark):
    df = _one_text(spark, "a a a b")
    assert df.select(P.top_token_frac(F.col("text")).alias("f")).collect()[0]["f"] == 0.75


def test_dup_trigram_frac(spark):
    # trigrams of "a b a b a b": [aba, bab, aba, bab] -> 2/4 duplicates
    df = _one_text(spark, "a b a b a b")
    assert df.select(P.dup_trigram_frac(F.col("text")).alias("f")).collect()[0]["f"] == 0.5


def test_dup_trigram_frac_short_doc_is_zero(spark):
    # sequence(1, n-2) would count DOWN for n<3 without the guard
    df = _one_text(spark, "a b")
    assert df.select(P.dup_trigram_frac(F.col("text")).alias("f")).collect()[0]["f"] == 0.0


def test_repetition_stats_udf_matches_expression_forms(spark):
    """The Arrow-batched hot path must agree bit-for-bit with the
    pure-expression forms (same IEEE ops on both paths)."""
    rows = [(i, t) for i, t in enumerate(
        ["a a a b", "a b a b a b", "x", "q w e r t y q w e", "z z", None]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["s"]["top_tok_frac"], r["s"]["dup_tri_frac"])
        for r in df.select("doc_id", P.repetition_stats(F.col("text")).alias("s")).collect()
    }
    want = {
        r["doc_id"]: (r["t"], r["d"])
        for r in df.select(
            "doc_id",
            P.top_token_frac(F.col("text")).alias("t"),
            P.dup_trigram_frac(F.col("text")).alias("d"),
        ).collect()
    }
    assert got == want


def test_scrub_pii_replaces_and_counts(spark):
    df = _one_text(spark, "mail bob@x.com or 555-123-4567 or 10.0.0.1 ok")
    row = df.select(
        P.scrub_pii(F.col("text")).alias("clean"), P.pii_count(F.col("text")).alias("n")
    ).collect()[0]
    assert row["n"] == 3
    assert row["clean"] == "mail <PII> or <PII> or <PII> ok"


def test_scrub_pii_clean_text_untouched(spark):
    df = _one_text(spark, "no personal data here at all")
    row = df.select(
        P.scrub_pii(F.col("text")).alias("clean"), P.pii_count(F.col("text")).alias("n")
    ).collect()[0]
    assert row["n"] == 0
    assert row["clean"] == "no personal data here at all"


def test_contamination_overlap_positive_and_negative(spark):
    bench = _one_text(spark, "alpha beta gamma delta epsilon zeta")
    corpus = spark.createDataFrame(
        [
            (10, "x y alpha beta gamma delta epsilon tail"),  # shares 5-grams
            (11, "totally different words in this document here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_overlap"] for r in P.contamination_overlap(corpus, bench).collect()}
    assert out[10] >= 1
    assert out[11] == 0


def test_stratified_mod_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i < 60 else "xx") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = P.stratified_mod_sample(df, "lang", "doc_id", {"en": 2}, default_k=10)
    got = sorted(r["doc_id"] for r in out.collect())
    # en: every even id below 60; unknown stratum: default 1-in-10
    assert got == [i for i in range(60) if i % 2 == 0] + [60, 70, 80, 90]
    # repartitioning must not change the selected set (unlike sampleBy)
    again = sorted(r["doc_id"] for r in P.stratified_mod_sample(
        df.repartition(7), "lang", "doc_id", {"en": 2}, default_k=10
    ).collect())
    assert again == got


@pytest.mark.parametrize(
    "sizes,budget,expect",
    [
        ([100, 100, 100], 256, [0, 0, 1]),  # third doc overflows
        ([300, 10], 256, [0, 1]),  # oversized doc occupies its bin alone
        ([256, 256], 256, [0, 1]),  # exact-fit boundary: > not >=
        ([50, 206, 1], 256, [0, 0, 1]),  # fills exactly, next overflows
    ],
)
def test_pack_sequences_greedy_rule(spark, sizes, budget, expect):
    rows = [("g", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "grp string, ord long, n long")
    out = P.pack_sequences(df, "grp", "ord", "n", budget=budget)
    got = {r["ord"]: r["seq_id"] for r in out.collect()}
    assert [got[i] for i in range(len(sizes))] == expect


def test_pack_sequences_rejects_nonpositive_budget(spark):
    # loud-guard rule (r15): budget<=0 silently degrades to one-doc bins
    import pytest

    df = spark.createDataFrame([("g", 0, 5)], "grp string, ord long, n long")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="budget must be >= 1"):
            P.pack_sequences(df, "grp", "ord", "n", budget=bad)


def test_pack_sequences_input_order_invariant(spark):
    rows = [("g", i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, ord long, n long")
    base = {r["ord"]: r["seq_id"] for r in P.pack_sequences(df, "grp", "ord", "n", 256).collect()}
    shuffled = {r["ord"]: r["seq_id"] for r in P.pack_sequences(
        df.orderBy(F.rand(seed=7)).repartition(5), "grp", "ord", "n", 256
    ).collect()}
    assert shuffled == base


def test_global_sort_rank_matches_single_partition_window(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame([(i, f"k{i%7}x{i}") for i in range(200)], "id long, k string")
    got = {r["id"]: r["pos"] for r in P.global_sort_rank(df, "k", n_partitions=8).collect()}
    want = {
        r["id"]: r["pos"]
        for r in df.withColumn("pos", F.row_number().over(Window.orderBy("k"))).collect()
    }
    assert got == want


def test_epoch_shuffle_reproducible_and_epoch_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    e1 = {r["doc_id"]: r["pos"] for r in P.epoch_shuffle(df, "doc_id", epoch=1).collect()}
    e1_again = {
        r["doc_id"]: r["pos"]
        for r in P.epoch_shuffle(df.repartition(9), "doc_id", epoch=1).collect()
    }
    e2 = {r["doc_id"]: r["pos"] for r in P.epoch_shuffle(df, "doc_id", epoch=2).collect()}
    assert e1 == e1_again  # same epoch: same permutation on any partitioning
    assert e1 != e2  # new epoch: fresh permutation
    assert sorted(e1.values()) == list(range(1, 101))  # a real permutation


def test_cap_per_group(spark):
    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(2)]
    df = spark.createDataFrame(rows, "src string, id long")
    out = P.cap_per_group(df, "src", "id", 3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r["id"])
    assert sorted(by_src["a"]) == [0, 1, 2]  # first 3 by order
    assert sorted(by_src["b"]) == [0, 1]  # under the cap: untouched


def test_quantize_int8_error_bound_and_range(spark):
    rows = [(1, [1.0, -0.5, 0.25, 127.0]), (2, [0.0, 0.0]), (3, [-2.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in P.quantize_embeddings_int8(df).collect()}
    for r in out.values():
        assert all(-128 <= q <= 127 for q in r["qvec"])
        # reconstruction error of symmetric int8 is at most scale/2
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
    assert out[2]["qvec"] == [0, 0] and out[2]["scale"] == 0.0  # zero-vector guard
    assert out[3]["qvec"] == [-127]


def test_temperature_mixing_quotas_and_flattening(spark):
    """Quota math: tau=0.5 up-weights low-resource strata relative to
    their raw share; quotas are deterministic integers and the kept
    rows are each stratum's smallest ids."""
    rows = [(i, "big") for i in range(900)] + [(i + 10_000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = P.temperature_mixing(df, "source", "doc_id", target_total=100, temperature=0.5)
    got = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("quota").alias("q"), F.max("doc_id").alias("mx")
    )
    by_src = {r["source"]: r for r in got.collect()}
    # raw shares 90/10; sqrt weights 30/10 -> quotas 75/25
    assert by_src["big"]["q"] == 75 and by_src["small"]["q"] == 25
    assert by_src["big"]["n"] == 75 and by_src["small"]["n"] == 25
    # smallest ids kept per stratum
    assert by_src["big"]["mx"] == 74 and by_src["small"]["mx"] == 10_024
    # tau=1 degenerates to proportional
    prop = P.temperature_mixing(df, "source", "doc_id", target_total=100, temperature=1.0)
    by_src1 = {r["source"]: r["quota"] for r in prop.select("source", "quota").distinct().collect()}
    assert by_src1 == {"big": 90, "small": 10}


def test_quantize_empty_vector_agrees_with_oracle(spark):
    """ADVICE r4: an empty embedding must yield scale=0.0 /
    max_abs_err=0.0 / qvec_str='' on BOTH engines — the oracle's
    list_max over an empty list is NULL unless COALESCE'd, which would
    silently diverge from the Spark UDF the day the fixture grows an
    empty vector."""
    import duckdb

    from apache_hadoop_framework_for_peptide_identification_spark.queries import REGISTRY

    rows = [(1, [1.0, -0.5]), (2, [])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r
        for r in P.quantize_embeddings_int8(df)
        .select("vec_id", "scale", F.array_join("qvec", ",").alias("qvec_str"), "max_abs_err")
        .collect()
    }
    assert got[2]["scale"] == 0.0 and got[2]["max_abs_err"] == 0.0
    assert got[2]["qvec_str"] == ""

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(1, [CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT)]), "
        "(2, CAST([] AS FLOAT[]))) AS t(vec_id, embedding)"
    )
    oracle = con.execute(REGISTRY["q90_embedding_quantize"].oracle).df()
    for _, orow in oracle.iterrows():
        srow = got[orow["vec_id"]]
        assert srow["scale"] == pytest.approx(orow["scale"])
        assert srow["qvec_str"] == orow["qvec_str"]
        assert srow["max_abs_err"] == pytest.approx(orow["max_abs_err"])
    con.close()


def test_upsert_snapshot_update_insert_delete(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame(
        [
            (2, "b2", 25.0, False),  # update
            (3, None, 0.0, True),  # delete (payload ignored)
            (9, "z", 90.0, False),  # insert
            (8, "y", 80.0, True),  # delete of nonexistent key: no-op
        ],
        "k long, name string, v double, is_delete boolean",
    )
    out = {r["k"]: (r["name"], r["v"]) for r in P.upsert_snapshot(
        base, updates, ["k"], delete_col="is_delete"
    ).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 9: ("z", 90.0)}


def test_snapshot_diff_empty_compare_cols(spark):
    """ADVICE r8 item 1: an added/removed-only diff (no payload columns
    to compare — a pure membership audit) is a plausible call and must
    degrade cleanly: keys present in both snapshots are vacuously
    unchanged, never 'changed', never a TypeError."""
    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    out = {r["k"]: r["change_type"] for r in P.snapshot_diff(old, new, ["k"], []).collect()}
    assert out == {1: "removed", 3: "added"}


def test_snapshot_diff_change_classes(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], "k long, v string")
    new = spark.createDataFrame([(2, "b2"), (3, None), (4, "d")], "k long, v string")
    out = {
        r["k"]: (r["change_type"], r["old_v"], r["new_v"])
        for r in P.snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    # NULL==NULL is unchanged (eqNullSafe) => key 3 absent from output.
    assert out == {
        1: ("removed", "a", None),
        2: ("changed", "b", "b2"),
        4: ("added", None, "d"),
    }


def test_upsert_snapshot_without_deletes(spark):
    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    updates = spark.createDataFrame([(1, 11.0), (2, 22.0)], "k long, v double")
    out = {r["k"]: r["v"] for r in P.upsert_snapshot(base, updates, ["k"]).collect()}
    assert out == {1: 11.0, 2: 22.0}


def test_remove_reference_spans_alignment_pad_and_boundaries(spark):
    """remove_reference_spans (r10): a reference 5-gram is excised at
    ANY offset (sliding detection); pad extends the removal window with
    boundary clamping; docs shorter than n and clean docs are
    untouched, and n_removed counts tokens."""
    ref = spark.createDataFrame(
        [(0, "e1 e2 e3 e4 e5 e6 e7 e8")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "a b c d e f g h i j"),        # clean
            (11, "a b c e1 e2 e3 e4 e5 x y z"),  # mid-doc leak
            (12, "e4 e5 e6 e7 e8 tail1 tail2"),  # leading leak
            (13, "a b c"),                       # < n tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in P.remove_reference_spans(corpus, ref, n=5, pad=0).collect()
    }
    assert got[10] == ("a b c d e f g h i j", 0)
    assert got[11] == ("a b c x y z", 5)
    assert got[12] == ("tail1 tail2", 5)
    assert got[13] == ("a b c", 0)

    padded = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in P.remove_reference_spans(corpus, ref, n=5, pad=2).collect()
    }
    assert padded[11] == ("a z", 9)   # pad eats b,c and x,y
    assert padded[12] == ("", 7)      # left pad clamps at doc start
    assert padded[10] == ("a b c d e f g h i j", 0)


def test_remove_reference_spans_dense_and_disjoint_intervals(spark):
    """r12 interval-merged coverage (VERDICT r11 obs. 2): a doc that IS
    the reference — every position a hit — must fold to one removal
    interval and excise completely, and two leaks separated by a gap
    wider than the pad must stay two DISJOINT intervals (the clean gap
    survives; over-merging would eat it)."""
    ref_text = " ".join(f"r{i}" for i in range(60))
    ref = spark.createDataFrame([(0, ref_text)], "doc_id long, text string")
    gap = " ".join(f"g{i}" for i in range(10))
    corpus = spark.createDataFrame(
        [
            (20, ref_text),  # fully contaminated: one merged interval
            (21, "r0 r1 r2 r3 r4 " + gap + " r10 r11 r12 r13 r14"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in P.remove_reference_spans(corpus, ref, n=5, pad=1).collect()
    }
    assert got[20] == ("", 60)
    # Each leak removes its 5 tokens + the one pad token that falls
    # inside the doc (the other pad clamps at the doc edge): 6 + 6.
    # The 8 interior gap tokens survive — two DISJOINT intervals.
    assert got[21] == (" ".join(f"g{i}" for i in range(1, 9)), 12)


def test_corpus_build_e2e_matches_oracle(spark):
    """The corpus-build capstone composition (queries/pipeline_q.py
    q201_corpus_build_e2e — VERDICT r15 item 8; r18 registry
    candidate): raw planted WARC bytes → parse → gate → extract →
    canonicalize → URL keeper dedup → the full q195 dedup ladder →
    temperature mixing → sequence packing, hash-compared against the
    single closed-form Q201_ORACLE replay at sf0.001 AND sf0.01 (the
    q200 pre-registration discipline). Also pins the exchange payload
    by TYPE: no KEYED (hash/range) exchange carries any string column
    beyond the tiny categorical 'topic'/'lang' strata — document
    text and normalized text cross only the single deliberate
    RoundRobin work-spreading repartition (the text-moves-exactly-once
    rule), never a join/agg shuffle where payload width multiplies."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries.pipeline_q import (
        Q201_ORACLE,
        q201_corpus_build_e2e,
    )
    from tests.oracle import compare, duck_connection

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        spdf = q201_corpus_build_e2e(spark, sf_dir).toPandas()
        con = duck_connection(sf_dir)
        rep = compare(spdf, con.execute(Q201_ORACLE).df())
        con.close()
        assert rep["match"], (sf_dir, rep)
        assert len(spdf) >= 20  # the 30-target mix modulo integer quotas
        # every topic stratum present; every bin within budget OR a
        # legitimate single-doc over-budget bin (pack_sequences'
        # bigger-than-budget contract) — per BIN, not globally
        assert set(spdf["topic"]) == {"news", "blog", "wiki"}
        grp = spdf.groupby(["topic", "seq_id"])["n_tok"]
        fill, counts = grp.sum(), grp.count()
        assert ((fill <= 128) | (counts == 1)).all(), fill[fill > 128]

    # Exchange-payload pin through the shared AQE-proof walker (r18 —
    # VERDICT r17 item 2: the old children()-only walk could not see
    # exchanges hidden inside ShuffleQueryStageExec/ReusedExchangeExec
    # nodes, and q201 re-enables AQE internally through
    # load_table/configure): no KEYED exchange may carry any string
    # column beyond the tiny categorical strata. At fixture scale the
    # post-checkpoint section is single-partition; the MULTI-partition
    # structural pin is test_dedup_mix_pack_plan_discipline below.
    from tests.planwalk import keyed_exchange_strings

    df = q201_corpus_build_e2e(spark, "/root/testdata/sf0.001")
    # topic/__topic are the tiny categorical strata (the internal alias
    # rides the mixing/packing shuffles); everything else — clean_text,
    # norm, shingles — is banned from keyed exchanges.
    bad = keyed_exchange_strings(df, allow=("topic", "__topic", "lang"))
    assert not bad, f"heavy strings riding exchanges: {bad}"


def test_dedup_mix_pack_plan_discipline(spark):
    """The q201/q203 downstream's at-scale plan contract, pinned on a
    MULTI-partition checkpoint with the AQE-proof walker — the two
    blind spots that let the r17 form ship (VERDICT r17 "What's
    wrong": 7 keeper-window instances collapsing to 3
    hashpartitioning(k_n) exchanges, one carrying normalized document
    text and reused 4x). The contract:

    (a) no KEYED exchange carries any string column beyond the tiny
        categorical topic strata — normalized text and raw shingles
        stay out of every join/agg shuffle (norm crosses only
        minhash's deliberate RoundRobin work-spreading repartition);
    (b) exactly ONE keeper reduction: one exchange hash-partitioned on
        k_n (the map-side-combinable min-id aggregate), not the r17
        window's three.
    """
    from tests.planwalk import exchanges, keyed_exchange_strings

    topic = (
        F.when(F.col("id") % 3 == 0, F.lit("news"))
        .when(F.col("id") % 3 == 1, F.lit("blog"))
        .otherwise(F.lit("wiki"))
    )
    # 400 docs over 50 exact-dup groups of 8 — the keeper stage, the
    # near-dup stage, mixing, and packing all do real work; repartition
    # BEFORE dedup_mix_pack so its localCheckpoint is multi-partition
    # (at 1 partition, SinglePartition satisfies every clustered
    # distribution and no exchange exists to inspect — blind spot (a)
    # of the r17 pin).
    surv = (
        spark.range(400)
        .select(
            F.col("id").alias("rec_id"),
            topic.alias("topic"),
            # every token carries the group id so distinct groups share
            # NO shingles (a shared suffix would make all 50 keepers
            # mutual near-dups and collapse the corpus to one doc)
            F.concat(
                *[
                    x
                    for t in "wxyzuv"
                    for x in (F.lit(f" {t}"), (F.col("id") % 50).cast("string"))
                ]
            ).alias("clean_text"),
        )
        .repartition(8)
    )
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = P.dedup_mix_pack(
            surv, id_col="rec_id", topic_col="topic", text_col="clean_text",
            target_total=30, budget=128,
        )
        bad = keyed_exchange_strings(df, allow=("__topic", "topic"))
        assert not bad, f"heavy strings riding keyed exchanges: {bad}"
        # (b) part 1: the keeper set eager-checkpoints before the
        # fan-out, so the returned plan holds ZERO k_n exchanges — the
        # reduction ran exactly once, at materialization (the r17 form
        # showed THREE, one per window re-execution).
        keeper_ex = [
            n for n in exchanges(df) if "k_n" in n.outputPartitioning().toString()
        ]
        assert not keeper_ex, (
            f"keeper reduction leaked into the fan-out plan: "
            f"{[n.outputPartitioning().toString()[:60] for n in keeper_ex]}"
        )
        # the walker is looking at live columns, not an empty tree
        assert len(exchanges(df)) >= 4, "walker went blind"
        # (b) part 2: the reduction subtree itself, pinned in isolation
        # on a keyed-shaped frame WITH norm aboard — exactly one
        # exchange, hash-partitioned on k_n, and Catalyst prunes norm
        # below it (only k_n + the partial min ride the shuffle).
        keyed = spark.createDataFrame(
            [(i, "t", 5, f"some normalized text {i % 7}", bytes([i % 7]))
             for i in range(64)],
            "__id long, __topic string, n_tok long, norm string, k_n binary",
        ).repartition(8)
        kdf = P._exact_keeper_ids(keyed)
        # the harness's own .repartition(8) is RoundRobin — keyed only
        kex = [
            n for n in exchanges(kdf)
            if "RoundRobin" not in n.outputPartitioning().toString()
        ]
        assert len(kex) == 1, [n.outputPartitioning().toString()[:60] for n in kex]
        assert "k_n" in kex[0].outputPartitioning().toString()
        out_cols = [
            kex[0].output().apply(j).name() for j in range(kex[0].output().size())
        ]
        assert "norm" not in out_cols and "__topic" not in out_cols, out_cols
        # map-side combine: a partial aggregate sits below the exchange
        plan_str = kdf._jdf.queryExecution().executedPlan().toString()
        assert "partial_min" in plan_str or "partial" in plan_str.lower(), plan_str
        # and the composition still computes: per-(topic, seq_id) bins
        # within budget or single-doc (the pack_sequences contract)
        out = df.toPandas()
        assert len(out) >= 20 and set(out["topic"]) == {"news", "blog", "wiki"}
        grp = out.groupby(["topic", "seq_id"])["n_tok"]
        assert ((grp.sum() <= 128) | (grp.count() == 1)).all()
        # broadcast_keepers=False (the beyond-broadcast-reach fallback,
        # r18 review finding: the id broadcast has an 8 GB ceiling the
        # co-shuffle doesn't) must land the IDENTICAL corpus — the
        # knob trades exchange shape only, never membership.
        out2 = (
            P.dedup_mix_pack(
                surv, id_col="rec_id", topic_col="topic",
                text_col="clean_text", target_total=30, budget=128,
                broadcast_keepers=False,
            )
            .toPandas()
            .sort_values(["rec_id"])
            .reset_index(drop=True)
        )
        assert out.sort_values(["rec_id"]).reset_index(drop=True).equals(out2)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)


def test_keeper_fallback_plan_discipline(spark):
    """broadcast_keepers=False plan pin (r19 — VERDICT r18 item 4):
    the fallback's docstring claims the co-shuffle semi-join ships
    ``norm`` through exactly ONE keyed exchange and leaves the keeper
    reduction at exactly one k_n exchange; result parity was already
    pinned (test_dedup_mix_pack_plan_discipline), the plan shape was
    not. Pinned on the factored _keeper_rows subtree because the
    composition checkpoints it — the semi-join never appears in
    dedup_mix_pack's returned plan. AQE off, multi-partition input
    (the r18 pin discipline)."""
    from tests.planwalk import exchanges

    keyed = spark.createDataFrame(
        [(i, "t", 5, f"some normalized text {i % 7}", bytes([i % 7]))
         for i in range(64)],
        "__id long, __topic string, n_tok long, norm string, k_n binary",
    ).repartition(8)
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # default mode first: norm rides NO keyed exchange at all (the
        # broadcast ships only 8-byte keeper ids)
        bdf = P._keeper_rows(keyed, broadcast_keepers=True)
        def keyed_with_norm(df):
            out = []
            for n in exchanges(df):
                part = n.outputPartitioning().toString()
                if "RoundRobin" in part:
                    continue
                cols = [n.output().apply(j).name() for j in range(n.output().size())]
                if "norm" in cols:
                    out.append(part[:60])
            return out
        assert keyed_with_norm(bdf) == [], keyed_with_norm(bdf)
        # fallback: norm rides EXACTLY ONE keyed exchange, and it is
        # the __id co-shuffle (never the k_n reduction)
        fdf = P._keeper_rows(keyed, broadcast_keepers=False)
        norm_ex = keyed_with_norm(fdf)
        assert len(norm_ex) == 1, norm_ex
        assert "__id" in norm_ex[0] and "k_n" not in norm_ex[0], norm_ex
        # keeper-reduction count unchanged by the knob: exactly one
        # hashpartitioning(k_n) exchange in either mode
        for df, mode in ((bdf, "broadcast"), (fdf, "fallback")):
            kex = [
                n for n in exchanges(df)
                if "k_n" in n.outputPartitioning().toString()
            ]
            assert len(kex) == 1, (mode, [
                n.outputPartitioning().toString()[:60] for n in kex
            ])
        # and the two modes agree on the rows (subtree-level parity —
        # the composition-level parity is pinned above)
        rows_b = sorted(tuple(r) for r in bdf.collect())
        rows_f = sorted(tuple(r) for r in fdf.collect())
        assert rows_b == rows_f and len(rows_b) > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)


def test_dedup_mix_pack_layout_invariant(spark):
    """The registered q201 downstream must be a pure function of the
    input SET: same survivors under different physical partitionings
    and row orders land the byte-identical packed mix (every keeper
    rule is an argmax over values — min id per k_n, id-ordered
    near-dup losers, id-ranked mixing, id-ordered packing — so no
    layout may leak into the result). Complements the oracle compare
    (one layout) the way q86's partitioning-invariance test
    complements its oracle."""
    rows = [
        (
            i,
            ["news", "blog", "wiki"][i % 3],
            " ".join(f"t{i % 40}w{j}" for j in range(6)),
        )
        for i in range(200)
    ]
    base = spark.createDataFrame(rows, "rec_id long, topic string, clean_text string")
    layouts = [
        base.coalesce(1),
        base.repartition(8),
        # reversed arrival order, different partitioner
        base.orderBy(F.col("rec_id").desc()).repartition(3, "topic"),
    ]
    outs = []
    for surv in layouts:
        outs.append(
            P.dedup_mix_pack(
                surv, id_col="rec_id", topic_col="topic",
                text_col="clean_text", target_total=30, budget=128,
            )
            .toPandas()
            .sort_values(["rec_id"])
            .reset_index(drop=True)
        )
    assert len(outs[0]) >= 20
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2]), (
        outs[0].head(), outs[1].head(), outs[2].head()
    )


def test_stream_corpus_build_matches_oneshot_oracle(spark):
    """q203_stream_corpus_build — VERDICT r16 item 7; registered r19,
    verified the way the driver will verify it: the FOUR-
    phase staged streaming build (incremental URL-keeper store with
    genuine cross-phase quality replacements + a mid-stream
    stop-compact-resume of the store) hash-matches q201's one-shot
    Q201_ORACLE at sf0.001 AND sf0.01 — the arrival-order-independence
    contract streaming/crawl.py states, proven end to end."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries.pipeline_q import (
        Q203_ORACLE,
        q203_stream_corpus_build,
    )
    from tests.oracle import compare, duck_connection

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        spdf = q203_stream_corpus_build(spark, sf_dir).toPandas()
        con = duck_connection(sf_dir)
        rep = compare(spdf, con.execute(Q203_ORACLE).df())
        con.close()
        assert rep["match"], (sf_dir, rep)
        assert len(spdf) > 0


def test_stream_crawl_ingest_store_semantics(spark, tmp_path):
    """The url_keepers store's own contract, unit-level: (1) changed-
    only writes — a later batch writes ONLY new URLs and genuine
    quality replacements, never re-sightings that lost; (2) the
    current-keeper read is the (qual desc, id asc) argmax, so a
    replacement actually flips keepership; (3) replaying a batch
    (crash before checkpoint commit) leaves the store state
    byte-identical — reads prune the replayed batch's own partition;
    (4) a fresh checkpoint over an existing store fails fast."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.operators import warc as W
    from apache_hadoop_framework_for_peptide_identification_spark.streaming import crawl as C

    store = str(tmp_path / "cstore")
    src = str(tmp_path / "csrc")
    ckpt = str(tmp_path / "cck")
    os.makedirs(src)
    crlf = "\r\n"

    def rec(rid: int, url: str, body: str) -> str:
        payload = (
            "HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" + crlf + crlf
            + f"<html><body><p>{body}</p></body></html>"
        )
        return (
            "WARC/1.0" + crlf + "WARC-Type: response" + crlf
            + f"WARC-Record-ID: <urn:doc:{rid}>" + crlf
            + f"WARC-Target-URI: {url}" + crlf
            + f"Content-Length: {len(payload.encode())}" + crlf + crlf
            + payload + crlf + crlf
        )

    rid_col = W.warc_header(F.col("record"), "WARC-Record-ID")
    id_expr = F.regexp_extract(rid_col, r"urn:doc:(\d+)", 1).cast("long")
    qual = (F.col("rec_id") * 7) % 10  # 1->7, 2->4, 3->1, 12->4

    def drain(recs: list[str], name: str) -> None:
        with open(os.path.join(src, name), "w", newline="") as fh:
            fh.write("".join(recs))
        C.stream_crawl_ingest(
            W.read_warc_stream(spark, src), store, ckpt,
            id_expr=id_expr, quality_expr=qual,
        )

    # batch 0: two URLs — keeper(u1)=1 (qual 7), keeper(u2)=2 (qual 4)
    drain([rec(1, "https://a.example.com/u1", "one"),
           rec(2, "https://a.example.com/u2", "two")], "b0.warc")
    # batch 1: rid 3 re-sights u1 with qual 1 (LOSES — must not write);
    # rid 12 re-sights u2 with qual 4, tie -> lower id 2 keeps (no
    # write); rid 5 is a new URL (writes)
    drain([rec(3, "https://a.example.com/u1", "one-again"),
           rec(12, "https://a.example.com/u2", "two-again"),
           rec(5, "https://a.example.com/u5", "five")], "b1.warc")
    # batch 2: rid 13 replaces u2's keeper (qual 13*7%10=1... pick 9)
    # -> use rid 7: 7*7%10=9 > 4, genuine replacement
    drain([rec(7, "https://a.example.com/u2", "two-better")], "b2.warc")

    b1 = {r["rec_id"] for r in spark.read.parquet(f"{store}/url_keepers/batch_id=1").collect()}
    assert b1 == {5}, b1  # changed-only: the losing re-sightings never landed
    cur = {r["canon_url"]: r["rec_id"]
           for r in C.crawl_store_keepers(spark, store).collect()}
    assert cur == {
        "https://a.example.com/u1": 1,
        "https://a.example.com/u2": 7,   # the batch-2 replacement flipped it
        "https://a.example.com/u5": 5,
    }, cur

    # the parameterless fragmentation sensor sees the crawl store (r17
    # review finding: url_keepers joined the default substores tuple)
    from apache_hadoop_framework_for_peptide_identification_spark.streaming.windows import (
        ingest_store_fragmentation,
    )

    frag = ingest_store_fragmentation(spark, store)
    assert frag["max_batch_id"] == 2
    assert frag["substores"]["url_keepers"] == {"partitions": 3, "compactable": 2}
    assert frag["compactable_partitions"] == 2

    # (3) replay batch 2 (same batch_id, same rows — a crash between
    # the partition overwrite and the checkpoint commit)
    bdf = spark.createDataFrame([(rec(7, "https://a.example.com/u2", "two-better"),)],
                                "record string")
    C._crawl_ingest_batch(spark, bdf, store, 2, id_expr, qual, {}, ())
    cur2 = {r["canon_url"]: r["rec_id"]
            for r in C.crawl_store_keepers(spark, store).collect()}
    assert cur2 == cur

    # (4) fresh checkpoint over the existing store refuses
    with open(os.path.join(src, "b3.warc"), "w", newline="") as fh:
        fh.write(rec(9, "https://a.example.com/u9", "nine"))
    with pytest.raises(ValueError, match="fresh checkpoint|no committed offsets"):
        C.stream_crawl_ingest(
            W.read_warc_stream(spark, src), store, str(tmp_path / "freshck"),
            id_expr=id_expr, quality_expr=qual,
        )


def test_stream_crawl_ingest_rejects_reserved_extra_cols(spark, tmp_path):
    """extra_cols provenance names must not shadow the keeper store's
    own columns (the parse_warc passthrough-collision rule): the clash
    raises at start, before any store mutation."""
    import pytest
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.streaming import crawl as C

    stream = spark.readStream.format("rate").load().select(
        F.lit("x").alias("record")
    )
    with pytest.raises(ValueError, match="collide"):
        C.stream_crawl_ingest(
            stream, str(tmp_path / "s"), str(tmp_path / "c"),
            id_expr=F.lit(1), quality_expr=F.lit(1),
            extra_cols={"qual": F.lit(2)},
        )
    # the kernel's INTERNAL helper names are reserved too (ADVICE r17):
    # '__new'/'__rn' only work by accident of the slim projections and
    # would break silently if the kernel ever windowed the full frame
    for name in ("__new", "__rn"):
        with pytest.raises(ValueError, match="collide"):
            C.stream_crawl_ingest(
                stream, str(tmp_path / "s2"), str(tmp_path / "c2"),
                id_expr=F.lit(1), quality_expr=F.lit(1),
                extra_cols={name: F.lit(2)},
            )


def test_seed_crawl_store_backfill(spark, tmp_path):
    """seed_crawl_store (r17): a batch backfill under batch_id=-1 must
    (1) leave the store startable by a FRESH-checkpoint stream (the
    seed_neardup_store convention — ids -1 vs 0..N never collide);
    (2) resolve later streamed replacements against the seeded
    history; (3) equal the streamed ingest of the same records
    row-for-row (same kernel, the docstring's bit-identical claim)."""
    import os

    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.operators import warc as W
    from apache_hadoop_framework_for_peptide_identification_spark.streaming import crawl as C

    crlf = "\r\n"

    def rec(rid: int, url: str, body: str) -> str:
        payload = (
            "HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" + crlf + crlf
            + f"<html><body><p>{body}</p></body></html>"
        )
        return (
            "WARC/1.0" + crlf + "WARC-Type: response" + crlf
            + f"WARC-Record-ID: <urn:doc:{rid}>" + crlf
            + f"WARC-Target-URI: {url}" + crlf
            + f"Content-Length: {len(payload.encode())}" + crlf + crlf
            + payload + crlf + crlf
        )

    rid_col = W.warc_header(F.col("record"), "WARC-Record-ID")
    id_expr = F.regexp_extract(rid_col, r"urn:doc:(\d+)", 1).cast("long")
    qual = (F.col("rec_id") * 7) % 10
    hist = [rec(1, "https://s.example.com/u1", "one"),
            rec(2, "https://s.example.com/u2", "two")]
    # rid 3 re-sights the SEEDED u1 with qual 1 < 7 — it must LOSE
    # against the backfilled history and never be written (the r17
    # review bug: the first streamed batch used to ignore a seed-only
    # store and write losing re-sightings, breaking the changed-only
    # invariant and replay byte-idempotence)
    arriving = [rec(7, "https://s.example.com/u2", "two-better"),  # 9 > 4
                rec(3, "https://s.example.com/u1", "one-again"),   # 1 < 7
                rec(5, "https://s.example.com/u5", "five")]

    # seeded store + fresh-checkpoint stream over it
    store = str(tmp_path / "sstore")
    src = str(tmp_path / "ssrc")
    os.makedirs(src)
    C.seed_crawl_store(
        spark.createDataFrame([(r,) for r in hist], "record string"),
        store, id_expr=id_expr, quality_expr=qual,
    )
    parts = {d for d in os.listdir(f"{store}/url_keepers") if d.startswith("batch_id=")}
    assert parts == {"batch_id=-1"}
    with open(os.path.join(src, "b0.warc"), "w", newline="") as fh:
        fh.write("".join(arriving))
    C.stream_crawl_ingest(
        W.read_warc_stream(spark, src), store, str(tmp_path / "sck"),
        id_expr=id_expr, quality_expr=qual,
    )
    seeded = sorted(map(tuple, C.crawl_store_keepers(spark, store)
                        .select("canon_url", "rec_id", "qual", "clean_text").collect()))
    assert {(u, r) for u, r, _, _ in seeded} == {
        ("https://s.example.com/u1", 1),
        ("https://s.example.com/u2", 7),
        ("https://s.example.com/u5", 5),
    }
    # changed-only against the SEED: the losing re-sight (rid 3) must
    # not appear anywhere in the streamed batch partition
    b0 = {r["rec_id"]
          for r in spark.read.parquet(f"{store}/url_keepers/batch_id=0").collect()}
    assert b0 == {7, 5}, b0

    # streamed-everything twin: two micro-batches, same records
    store2 = str(tmp_path / "tstore")
    src2 = str(tmp_path / "tsrc")
    os.makedirs(src2)
    for i, batch in enumerate([hist, arriving]):
        with open(os.path.join(src2, f"b{i}.warc"), "w", newline="") as fh:
            fh.write("".join(batch))
        C.stream_crawl_ingest(
            W.read_warc_stream(spark, src2), store2, str(tmp_path / "tck"),
            id_expr=id_expr, quality_expr=qual,
        )
    streamed = sorted(map(tuple, C.crawl_store_keepers(spark, store2)
                          .select("canon_url", "rec_id", "qual", "clean_text").collect()))
    assert streamed == seeded


def test_stream_corpus_build_order_independent_adversarial(spark):
    """The q203 contract is UNIVERSAL ("any batch split lands the
    identical packed mix"), so probe it beyond the driver form's
    schedule: (a) re-crawls arrive FIRST and every original arrives
    later with lower quality — keepership must NOT flip to the
    later arrival (replacement suppression, the mirror image of the
    staged flip); (b) a single-phase everything-at-once stream.
    Both must hash-match the same one-shot oracle."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries.pipeline_q import (
        Q203_ORACLE,
        _staged_stream_corpus_build,
    )
    from tests.oracle import compare, duck_connection

    sf_dir = "/root/testdata/sf0.001"
    con = duck_connection(sf_dir)
    want = con.execute(Q203_ORACLE).df()
    for phases, compact in (
        ([(200, 220), (0, 100), (100, 200)], None),   # re-crawls first
        ([(0, 220)], None),                           # one shot as a stream
    ):
        spdf = _staged_stream_corpus_build(
            spark, sf_dir, phases=phases, compact_before_phase=compact
        ).toPandas()
        rep = compare(spdf, want)
        assert rep["match"], (phases, rep)
    con.close()


def test_crawl_store_keepers_names_empty_store(spark, tmp_path):
    """Reading keepers from an absent/empty store raises a NAMED error
    (the compact_ingest_store empty-store rule), not a raw parquet
    PATH_NOT_FOUND from inside the reader."""
    import pytest

    from apache_hadoop_framework_for_peptide_identification_spark.streaming import crawl as C

    with pytest.raises(ValueError, match="no url_keepers"):
        C.crawl_store_keepers(spark, str(tmp_path / "nostore"))
    with pytest.raises(ValueError, match="no url_keepers"):
        C.build_corpus_from_crawl_store(spark, str(tmp_path / "nostore"))
