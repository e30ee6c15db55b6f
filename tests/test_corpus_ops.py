"""Operator-level tests for operators/corpus.py — semantics the oracle
differential can't pin down on its own (first-occurrence policy, rank
ordering, reassembly, empty-survivor docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators import corpus as C


def test_paragraph_dedup_first_occurrence_wins(spark):
    # doc 0 and doc 1 share chunk "a b"; doc 0 (lower id) must keep it.
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in C.paragraph_dedup(df, "doc_id", "text", chunk_tokens=2).collect()
    }
    assert out[0]["clean_text"] == "a b" and out[0]["n_removed"] == 0
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "c d"


def test_paragraph_dedup_intra_doc_repeat_and_order(spark):
    # Second occurrence of "x y" INSIDE the same doc is also a repeat;
    # surviving chunks must reassemble in chunk_idx order.
    df = spark.createDataFrame([(5, "x y p q x y r s")], "doc_id long, text string")
    row = C.paragraph_dedup(df, "doc_id", "text", chunk_tokens=2).collect()[0]
    assert row["n_chunks"] == 4 and row["n_removed"] == 1
    assert row["clean_text"] == "x y p q r s"


def test_paragraph_dedup_trailing_partial_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    row = C.paragraph_dedup(df, "doc_id", "text", chunk_tokens=2).collect()[0]
    assert row["n_chunks"] == 2 and row["clean_text"] == "a b c"


def test_bigram_lm_score_orders_by_familiarity(spark):
    train = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zz qq ww"), (12, "x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in C.bigram_lm_score(docs, train, "doc_id", "text").collect()
    }
    # "the cat" seen twice, "cat sat" once -> mean 1.5; junk doc -> 0.
    assert got[10]["lm_familiarity"] == 1.5
    assert got[11]["lm_familiarity"] == 0.0
    assert got[12]["n_bigrams"] == 0 and got[12]["lm_familiarity"] is None


def test_bm25_ranks_term_dense_docs_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "table table table pad pad"),
            (2, "table pad pad pad pad"),
            (3, "pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    rows = C.bm25_topk(docs, "doc_id", "text", ("table",), k=3).collect()
    assert [r["doc_id"] for r in rows] == [1, 2, 3]
    assert rows[0]["bm25"] > rows[1]["bm25"] > 0.0
    assert rows[2]["bm25"] == 0.0  # no query term -> exact zero score


def test_top_ngrams_counts_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = C.top_ngrams(docs, "text", k=10).collect()
    assert (rows[0]["bigram"], rows[0]["n"]) == ("a b", 3)
    # ties broken by bigram ascending
    tail = [(r["bigram"], r["n"]) for r in rows[1:]]
    assert tail == [("b a", 1), ("b c", 1)]


def test_cms_sketch_never_underestimates_and_merge_is_exact(spark):
    """CMS contract: point estimates are >= the true count for EVERY
    bigram (never under), the d=0 row sums to the total bigram count
    (cell-wise merge lost nothing), and the bounds check passes on the
    exact heavy hitters."""
    docs = spark.createDataFrame(
        [(i, "x y " * (i + 1) + "tail " + str(i)) for i in range(20)],
        "doc_id long, text string",
    ).repartition(4)
    width, depth = 256, 4
    cells = {
        (r["d"], r["j"]): r["c"]
        for r in C.cms_cells(docs, "text", width, depth).collect()
    }
    exact = {r["bigram"]: r["n"] for r in C.top_ngrams(docs, "text", k=1000).collect()}
    total = sum(exact.values())
    assert sum(c for (d, _), c in cells.items() if d == 0) == total
    for bg, n in exact.items():
        assert C.cms_estimate(cells, bg, width, depth) >= n
    chk = C.approx_top_ngrams_check(docs, "text", k=5, width=16384, depth=8)
    assert all(r["within_bounds"] for r in chk.collect())


def test_profile_table_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x")], "k long, v string"
    )
    row = C.profile_table(df, ["k", "v"]).collect()[0]
    assert row["n_rows"] == 3
    assert row["k_nulls"] == 0 and row["k_distinct"] == 3
    assert row["v_nulls"] == 1 and row["v_distinct"] == 1


def test_equiwidth_histogram_buckets(spark):
    df = spark.createDataFrame([(v,) for v in [1, 9, 10, 19, 25]], "v long")
    rows = {
        r["bucket"]: r
        for r in C.equiwidth_histogram(df, F.col("v"), 10).collect()
    }
    assert rows[0]["n"] == 2 and rows[0]["min_v"] == 1 and rows[0]["max_v"] == 9
    assert rows[10]["n"] == 2 and rows[10]["mean_v"] == 14.5
    assert rows[20]["n"] == 1


def test_equiwidth_histogram_rejects_nonpositive_width(spark):
    # loud-guard rule (r15): width=0 would otherwise surface as an
    # opaque ANSI DIVIDE_BY_ZERO at execution, negative widths invert keys
    import pytest

    df = spark.createDataFrame([(1,)], "v long")
    for bad in (0, -10):
        with pytest.raises(ValueError, match="width must be >= 1"):
            C.equiwidth_histogram(df, F.col("v"), bad)


def test_unicode_normalize_forms_and_agreement(spark, duck):
    """r13 unicode_normalize: NFC composes precomposed/decomposed/
    reordered encodings to one form, NFD inverts it, NFKC folds
    compatibility chars NFC must NOT touch, nulls pass through, bad
    forms are rejected — and NFC agrees byte-for-byte with DuckDB's
    independent utf8proc implementation on every case."""
    import pytest
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.operators import text as T

    cases = [
        "caf\u00e9",          # precomposed
        "cafe\u0301",         # combining acute
        "s\u0307\u0323x",    # non-canonical diacritic order
        "\u212bngstrom",      # ANGSTROM SIGN -> A-ring under NFC
        "\ufb01sh",           # fi ligature: NFC keeps, NFKC folds
        "ascii only",
        None,
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, s string")
    out = {
        r["i"]: (r["nfc"], r["nfkc"])
        for r in df.select(
            "i",
            T.unicode_normalize(F.col("s")).alias("nfc"),
            T.unicode_normalize(F.col("s"), "NFKC").alias("nfkc"),
        ).collect()
    }
    import unicodedata as U

    for i, c in enumerate(cases):
        if c is None:
            assert out[i] == (None, None)
            continue
        assert out[i][0] == U.normalize("NFC", c), c
        assert out[i][1] == U.normalize("NFKC", c), c
        duck_nfc = duck.execute("SELECT nfc_normalize(?)", [c]).fetchone()[0]
        assert out[i][0] == duck_nfc, c
    # the ligature distinguishes NFC from NFKC
    assert out[4][0] == "\ufb01sh" and out[4][1] == "fish"
    with pytest.raises(ValueError, match="NFC/NFD"):
        T.unicode_normalize(F.col("s"), "NFX")


def test_trained_lid_edges_ties_and_partition_histogram(spark):
    """r16 trained LID (operators/text.train_char_ngram_lid /
    char_ngram_lid — VERDICT r15 item 4): (1) NULL text, shorter-than-n
    text, and fully-unseen-vocabulary docs classify 'und' with score 0
    instead of silently dropping; (2) the argmax tie-break is the
    lexicographically smallest language; (3) partitioning the scored
    output by predicted language yields the planted per-language
    histogram — the partition-pruned layout a 100 TB language gate
    writes."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import text as T

    train = spark.createDataFrame(
        [("en", "the cat sat on the mat with the hat"),
         ("en", "the dog and the log on the bog"),
         ("xx", "zqv zqv wjx wjx kpy kpy zqv wjx"),
         ("xx", "kpy wjx zqv kpy kpy wjx zqv zqv")],
        "lang string, text string",
    )
    model = T.train_char_ngram_lid(train, "text", "lang", n=3, buckets=512)
    m = {(r["bucket"], r["lang"]): r["w"] for r in model.collect()}
    assert all(w >= 0 for w in m.values())
    docs = spark.createDataFrame(
        [(1, "the cat and the dog sat"),   # en
         (2, "zqv wjx kpy zqv wjx"),       # xx
         (3, None),                         # null -> und
         (4, "ab"),                         # shorter than n -> und
         (5, "ÿþýü")],  # unseen vocabulary -> und
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["lang"], r["score"])
           for r in T.char_ngram_lid(docs, "doc_id", "text", model, n=3, buckets=512).collect()}
    assert out[1][0] == "en" and out[1][1] > 0
    assert out[2][0] == "xx" and out[2][1] > 0
    assert out[3] == ("und", 0) and out[4] == ("und", 0) and out[5] == ("und", 0)

    # tie-break: a model where two langs share every weight must pick
    # the lexicographically smaller language deterministically
    tie_train = spark.createDataFrame(
        [("aa", "mnop mnop"), ("bb", "mnop mnop")], "lang string, text string"
    )
    tie_model = T.train_char_ngram_lid(tie_train, "text", "lang", n=3, buckets=512)
    tie = T.char_ngram_lid(
        spark.createDataFrame([(9, "mnop")], "doc_id long, text string"),
        "doc_id", "text", tie_model, n=3, buckets=512,
    ).collect()[0]
    assert tie["lang"] == "aa" and tie["score"] > 0

    # partition histogram: 6 en docs + 3 xx docs + 1 und -> writing
    # partitionBy(lang) lays out exactly those three partitions
    import tempfile

    big = spark.createDataFrame(
        [(i, "the cat and the dog sat on the mat") for i in range(6)]
        + [(10 + i, "zqv wjx kpy zqv wjx kpy") for i in range(3)]
        + [(20, "x")],
        "doc_id long, text string",
    )
    scored = T.char_ngram_lid(big, "doc_id", "text", model, n=3, buckets=512)
    hist = {r["lang"]: r["n"] for r in
            scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert hist == {"en": 6, "xx": 3, "und": 1}
    with tempfile.TemporaryDirectory() as d:
        scored.write.partitionBy("lang").parquet(f"{d}/out")
        import os

        parts = sorted(p for p in os.listdir(f"{d}/out") if p.startswith("lang="))
        assert parts == ["lang=en", "lang=und", "lang=xx"]
        back = spark.read.parquet(f"{d}/out")
        assert back.filter(F.col("lang") == "en").count() == 6


def test_quality_gate_edges_and_threshold(spark):
    """r17 trained quality gate (operators/text.quality_gate — VERDICT
    r16 item 3): (1) clearly-keep and clearly-drop texts separate with
    the right margin signs; (2) NULL / shorter-than-n / fully-unseen
    docs FAIL CLOSED (margin 0, keep=false at the default threshold)
    and fail OPEN at threshold=-1; (3) the margin is the exact BIGINT
    keep-minus-drop weight sum (hand-checked against the collected
    model); (4) identical labels raise."""
    import pytest

    from apache_hadoop_framework_for_peptide_identification_spark.operators import text as T

    train = spark.createDataFrame(
        [("keep", "the cat sat on the mat with the hat"),
         ("keep", "the dog and the log on the bog"),
         ("drop", "click here subscribe now cookie policy"),
         ("drop", "subscribe now click here rights reserved")],
        "lang string, text string",
    )
    model = T.train_char_ngram_lid(train, "text", "lang", n=3, buckets=512)
    docs = spark.createDataFrame(
        [(1, "the cat and the dog sat on the mat"),
         (2, "click here subscribe now rights reserved"),
         (3, None),
         (4, "ab"),
         (5, "ÿþýü")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["margin"], r["keep"])
           for r in T.quality_gate(docs, "doc_id", "text", model,
                                   n=3, buckets=512).collect()}
    assert out[1][0] > 0 and out[1][1] is True
    assert out[2][0] < 0 and out[2][1] is False
    for d in (3, 4, 5):
        assert out[d] == (0, False), (d, out[d])
    # fail open at threshold=-1: the unjudgeable docs flip to keep
    open_out = {r["doc_id"]: r["keep"]
                for r in T.quality_gate(docs, "doc_id", "text", model,
                                        threshold=-1, n=3, buckets=512).collect()}
    assert open_out[3] is True and open_out[4] is True and open_out[5] is True
    assert open_out[2] is False  # a real negative margin stays dropped

    # (3) margin equals the hand-computed sum over the collected model
    w = {}
    for r in model.collect():
        w.setdefault(r["bucket"], {})[r["lang"]] = r["w"]
    import hashlib

    def bucket(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 512

    text1 = "the cat and the dog sat on the mat"
    hand = 0
    for i in range(len(text1) - 2):
        bw = w.get(bucket(text1[i:i + 3]), {})
        hand += bw.get("keep", 0) - bw.get("drop", 0)
    assert out[1][0] == hand

    with pytest.raises(ValueError, match="must differ"):
        T.quality_gate(docs, "doc_id", "text", model,
                       keep_label="keep", drop_label="keep")

    # (5) labels absent from the model raise (ADVICE r17): a model
    # trained 'good'/'bad' scored with the default 'keep'/'drop' would
    # otherwise score every doc at margin 0 — the whole corpus
    # silently dropped at the default threshold.
    gb = T.train_char_ngram_lid(
        train.select(
            F.when(F.col("lang") == "keep", "good").otherwise("bad").alias("lang"),
            "text",
        ),
        "text", "lang", n=3, buckets=512,
    )
    with pytest.raises(ValueError, match="absent from the model"):
        T.quality_gate(docs, "doc_id", "text", gb, n=3, buckets=512)
    # one valid + one absent label names BOTH get reported
    with pytest.raises(ValueError, match="drop"):
        T.quality_gate(docs, "doc_id", "text", gb,
                       keep_label="good", drop_label="drop", n=3, buckets=512)
    # and the renamed labels work end-to-end when passed explicitly
    renamed = {r["doc_id"]: r["keep"]
               for r in T.quality_gate(docs, "doc_id", "text", gb,
                                       keep_label="good", drop_label="bad",
                                       n=3, buckets=512).collect()}
    assert renamed[1] is True and renamed[2] is False

    # (6) the label probe is memoized per model frame (ADVICE r18:
    # calibration sweeps call the gate repeatedly with the same
    # model — the distinct-label collect must run once, not per
    # call). Proven by USE: poison the cache entry with a label the
    # model does not contain; if the second call re-probed Spark it
    # would raise "absent from the model", so not raising means the
    # guard read the cache.
    assert T._MODEL_LABELS.get(model) == frozenset({"keep", "drop"})
    T._MODEL_LABELS[model] = frozenset({"keep", "drop", "ghost"})
    try:
        T.quality_gate(docs, "doc_id", "text", model,
                       keep_label="ghost", drop_label="drop",
                       n=3, buckets=512)
    finally:
        del T._MODEL_LABELS[model]


def test_quality_gate_form_matches_oracle(spark):
    """The q202 gate (registered r18) verified the way the driver will
    verify it (queries/llm.py q202_trained_quality_gate + Q202_ORACLE):
    full SQL retrain + re-score replay, hash-compared at sf0.001 AND
    sf0.01 (the q200/q201 pre-registration discipline), plus the
    separation sanity check — the gate must actually split the planted
    clean/boilerplate classes, or the fixture stopped measuring."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries.llm import (
        Q202_ORACLE,
        q202_trained_quality_gate,
    )
    from tests.oracle import compare, duck_connection

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        spdf = q202_trained_quality_gate(spark, sf_dir).toPandas()
        con = duck_connection(sf_dir)
        rep = compare(spdf, con.execute(Q202_ORACLE).df())
        con.close()
        assert rep["match"], (sf_dir, rep)
        assert len(spdf) == 200
        kept = int(spdf["keep"].sum())
        assert 0 < kept < 200, kept
        # the planted classes must land on the right side of the gate:
        # every even (clean) doc keeps, every odd (boilerplate) drops
        even_kept = spdf[spdf.doc_id % 2 == 0]["keep"]
        odd_kept = spdf[spdf.doc_id % 2 == 1]["keep"]
        assert float(even_kept.mean()) > 0.9, float(even_kept.mean())
        assert float(odd_kept.mean()) < 0.1, float(odd_kept.mean())
