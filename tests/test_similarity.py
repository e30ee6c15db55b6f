"""Similarity/ANN operator tests: recall of the approximate paths
(hyperplane-LSH, IVF-Flat) against exact brute force, measured on data
with GENUINE near-duplicates (the synthetic fixture embeddings are
random — max pairwise cos ~0.51 — so true-dup recall is built here by
perturbing copies)."""

from __future__ import annotations

import numpy as np
import pytest

from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity

DIM = 64
N_BASE = 200
N_DUPS = 40


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """N_BASE random unit vectors + N_DUPS slightly-perturbed copies of
    the first N_DUPS (cos(original, copy) > 0.99). Copy ids are
    original_id + 10_000."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # ||noise|| ~ 0.01*sqrt(64) = 0.08 → cos(orig, copy) ~ 0.997
    noise = 0.01 * rng.standard_normal((N_DUPS, DIM))
    dups = base[:N_DUPS] + noise
    rows = [(i, base[i].astype(float).tolist()) for i in range(N_BASE)] + [
        (10_000 + i, dups[i].astype(float).tolist()) for i in range(N_DUPS)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_exact_neardup_finds_planted_dups(dup_corpus):
    got = _pairs(
        similarity.embedding_neardup_pairs(dup_corpus, threshold=0.95)
    )
    expected = {(i, 10_000 + i) for i in range(N_DUPS)}
    assert expected <= got
    # and nothing else — random pairs sit far below 0.95
    assert got == expected


def test_lsh_neardup_recall_and_precision(dup_corpus):
    exact = _pairs(similarity.embedding_neardup_pairs(dup_corpus, threshold=0.95))
    approx = _pairs(
        similarity.embedding_neardup_lsh(
            dup_corpus, threshold=0.95, bits=32, bands=16, dim=DIM
        )
    )
    # Precision exact by construction (candidates pass the exact filter)
    assert approx <= exact
    # Recall: 16 bands x 2 bits at cos>=0.99 collide with prob ~1
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.95, f"LSH near-dup recall {recall}"


def test_ivf_recall_vs_brute_force(dup_corpus):
    queries = dup_corpus.filter("vec_id >= 10000")  # the perturbed copies
    exact = similarity.cosine_topk(dup_corpus, queries, k=1).collect()
    approx = similarity.ivf_topk(
        dup_corpus, queries, k=1, n_cells=16, n_probe=8
    ).collect()
    # For a perturbed copy, the true nearest neighbor is its original.
    exact_nn = {r["q_id"]: r["n_id"] for r in exact}
    assert exact_nn == {10_000 + i: i for i in range(N_DUPS)}
    approx_nn = {r["q_id"]: r["n_id"] for r in approx}
    hits = sum(approx_nn.get(q) == n for q, n in exact_nn.items())
    assert hits / len(exact_nn) >= 0.9, f"IVF recall@1 {hits / len(exact_nn)}"


def test_lsh_ann_recall_vs_brute_force(dup_corpus):
    queries = dup_corpus.filter("vec_id >= 10000")
    exact = similarity.cosine_topk(dup_corpus, queries, k=1).collect()
    approx = similarity.lsh_ann_topk(
        dup_corpus, queries, k=1, bits=16, bands=8, dim=DIM
    ).collect()
    exact_nn = {r["q_id"]: r["n_id"] for r in exact}
    approx_nn = {r["q_id"]: r["n_id"] for r in approx}
    hits = sum(approx_nn.get(q) == n for q, n in exact_nn.items())
    assert hits / len(exact_nn) >= 0.9, f"LSH ANN recall@1 {hits / len(exact_nn)}"


def test_semantic_dedup_exact_form_drops_planted_dups(dup_corpus):
    """n_clusters=1 (the exactness/oracle config): every planted copy
    is dropped, every base vector kept, keeper = min id."""
    kept = {
        r["vec_id"]
        for r in similarity.semantic_dedup(
            dup_corpus, threshold=0.95, n_clusters=1
        ).collect()
    }
    assert kept == set(range(N_BASE))


def test_semantic_dedup_clustered_recall_and_determinism(dup_corpus):
    """Production multi-cluster path: a copy survives only if it lands
    in a different coarse cell than its original (the paper's accepted
    cross-cluster miss); at cos~0.997 nearly all co-locate. Recall vs
    the exact form ≥ 0.8, no false drops, and the result is identical
    across runs (seeded quantizer, deterministic keeper)."""
    kept1 = {
        r["vec_id"]
        for r in similarity.semantic_dedup(
            dup_corpus, threshold=0.95, n_clusters=8
        ).collect()
    }
    kept2 = {
        r["vec_id"]
        for r in similarity.semantic_dedup(
            dup_corpus, threshold=0.95, n_clusters=8
        ).collect()
    }
    assert kept1 == kept2
    assert set(range(N_BASE)) <= kept1  # base vectors never dropped
    dropped = {10_000 + i for i in range(N_DUPS)} - kept1
    assert len(dropped) >= 0.8 * N_DUPS


def test_lsh_neardup_max_bucket_caps_degenerate(spark):
    """A zero-ish repeated vector floods one bucket per band; max_bucket
    drops it while a planted near-dup pair still pairs up."""
    rng = np.random.RandomState(13)
    v = rng.standard_normal(DIM)
    v /= np.linalg.norm(v)
    dup = v + 0.01 * rng.standard_normal(DIM)
    same = rng.standard_normal(DIM)
    same /= np.linalg.norm(same)
    rows = [(i, same.astype(float).tolist()) for i in range(40)]  # 40 identical
    rows += [(100, v.astype(float).tolist()), (101, dup.astype(float).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_lsh(
            df, threshold=0.95, bits=32, bands=16, dim=DIM, max_bucket=10
        ).collect()
    }
    assert (100, 101) in got
    assert not any(a < 40 and b < 40 for a, b in got)


def test_pq_ann_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity

    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    want = {}
    for r in similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect():
        want.setdefault(r["q_id"], set()).add(r["n_id"])
    got = {}
    pq = similarity.pq_ann_topk(emb, queries, "vec_id", "embedding", k=5, n_candidates=150)
    for r in pq.collect():
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    recall = sum(len(got[q] & want[q]) for q in want) / sum(len(want[q]) for q in want)
    # random unclustered fixture vectors are PQ's worst case (no cluster
    # structure for the codebooks to exploit); the candidate budget is the
    # recall knob — 150-of-500 here; at real scale an absolute budget
    assert recall >= 0.8, recall
    # determinism: same seed, same result
    again = {}
    for r in similarity.pq_ann_topk(emb, queries, "vec_id", "embedding", k=5, n_candidates=150).collect():
        again.setdefault(r["q_id"], set()).add(r["n_id"])
    assert again == got


def test_rrf_fuse_hand_computed(spark):
    """RRF on two hand-built lists: overlap ids sum both reciprocal
    ranks, single-list ids keep one, ties break on id, top-k cuts."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rnk long")
    sem = spark.createDataFrame([(20, 1), (40, 2), (10, 3)], "doc_id long, rnk long")
    out = rrf_fuse([lex, sem], "doc_id", "rnk", k_const=60, topk=3).collect()
    got = [(r["doc_id"], r["rrf"]) for r in out]
    import pytest as _pytest

    # 20: 1/62 + 1/61 ; 10: 1/61 + 1/63 ; 40: 1/62 ; 30: 1/63 (cut by topk)
    assert [d for d, _ in got] == [20, 10, 40]
    assert got[0][1] == _pytest.approx(1 / 62 + 1 / 61)
    assert got[1][1] == _pytest.approx(1 / 61 + 1 / 63)
    assert got[2][1] == _pytest.approx(1 / 62)


def test_rrf_fuse_rejects_empty_input():
    from apache_hadoop_framework_for_peptide_identification_spark.operators.similarity import rrf_fuse

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one ranked list"):
        rrf_fuse([], "doc_id", "rnk")


def test_ivf_query_reuses_one_persisted_index(dup_corpus, tmp_path):
    """The r10 IVF split (ANN twin of the dedup index split): build the
    index ONCE, round-trip BOTH frames through parquet (proving the
    persistability the docstring claims — centroids must survive the
    store bit-exactly), run two separate query batches against the
    stored index, and assert each equals the one-shot ivf_topk form."""
    from pyspark.sql import functions as F

    spark = dup_corpus.sparkSession
    assigned, cents = similarity.build_ivf_index(
        dup_corpus, "vec_id", "embedding", n_cells=8, seed=42
    )
    idx_dir, cent_dir = str(tmp_path / "idx"), str(tmp_path / "cents")
    assigned.write.partitionBy("cell").parquet(idx_dir)
    cents.write.parquet(cent_dir)
    stored_idx = spark.read.parquet(idx_dir)
    stored_cents = spark.read.parquet(cent_dir)

    for lo, hi in ((0, 3), (3, 6)):
        batch = dup_corpus.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        got = {
            (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
            for r in similarity.ivf_query(
                batch, stored_idx, stored_cents, "vec_id", "embedding",
                k=3, n_probe=8,
            ).collect()
        }
        want = {
            (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
            for r in similarity.ivf_topk(
                dup_corpus, batch, "vec_id", "embedding",
                k=3, n_cells=8, n_probe=8, seed=42,
            ).collect()
        }
        assert got == want


def test_pq_query_reuses_one_persisted_index(spark, tmp_path):
    """The r10 PQ split (completes the persisted-index trilogy): build
    the PQ index ONCE, round-trip (encoded, codebook) through parquet,
    run two query batches against the stored frames, and assert each
    equals the one-shot pq_ann_topk form — proving the codebook
    survives the store bit-exactly and the corpus is never re-encoded
    per query batch."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity

    emb = load_table(spark, SF_ORACLE, "embeddings")
    encoded, cb = similarity.build_pq_index(emb, "vec_id", "embedding", m=8, n_codes=16)
    enc_dir, cb_dir = str(tmp_path / "enc"), str(tmp_path / "cb")
    encoded.write.parquet(enc_dir)
    cb.write.parquet(cb_dir)
    stored_enc = spark.read.parquet(enc_dir)
    stored_cb = spark.read.parquet(cb_dir)

    for lo, hi in ((0, 3), (3, 5)):
        batch = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        got = {
            (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
            for r in similarity.pq_query(
                batch, stored_enc, stored_cb, emb, "vec_id", "embedding",
                k=5, n_candidates=150,
            ).collect()
        }
        want = {
            (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
            for r in similarity.pq_ann_topk(
                emb, batch, "vec_id", "embedding", k=5, n_candidates=150,
            ).collect()
        }
        assert got == want


def test_pq_query_empty_query_batch_returns_empty(spark):
    """An idle trigger delivering zero queries must yield an empty,
    correctly-schema'd result — not an opaque np.vstack ValueError
    (the rrf_fuse empty-input precedent)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity

    emb = load_table(spark, SF_ORACLE, "embeddings")
    encoded, cb = similarity.build_pq_index(emb, "vec_id", "embedding")
    out = similarity.pq_query(
        emb.filter(F.lit(False)), encoded, cb, emb, "vec_id", "embedding"
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["q_id", "n_id", "cos_sim", "rn"]


def test_ivf_append_equals_assign_all_with_same_centroids(dup_corpus, tmp_path):
    """The r11 append API (VERDICT r10 item 3): build(A) + append(B)
    must equal assigning A∪B with A's centroid frame, row-for-row, and
    queries against the appended index must equal queries against the
    all-at-once assignment — through a parquet round-trip of the
    centroid frame, since append's whole point is joining an index
    read back from its store."""
    from pyspark.sql import functions as F

    spark = dup_corpus.sparkSession
    a = dup_corpus.filter(F.col("vec_id") < 150)
    b = dup_corpus.filter(F.col("vec_id") >= 150)
    assigned_a, cents = similarity.build_ivf_index(
        a, "vec_id", "embedding", n_cells=8, seed=42
    )
    cents.write.parquet(str(tmp_path / "cents"))
    stored_cents = spark.read.parquet(str(tmp_path / "cents"))

    appended = similarity.ivf_append(
        b, stored_cents, "vec_id", "embedding", index=assigned_a
    )
    grown = assigned_a.unionByName(appended)
    # all-at-once assignment with the SAME centroid frame
    direct = similarity.ivf_append(dup_corpus, stored_cents, "vec_id", "embedding")

    def cells(df):
        return {r["vec_id"]: r["cell"] for r in df.select("vec_id", "cell").collect()}

    assert cells(grown) == cells(direct)

    queries = dup_corpus.filter(F.col("vec_id") < 3)
    got = {
        (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
        for r in similarity.ivf_query(
            queries, grown, stored_cents, "vec_id", "embedding", k=3, n_probe=8
        ).collect()
    }
    want = {
        (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
        for r in similarity.ivf_query(
            queries, direct, stored_cents, "vec_id", "embedding", k=3, n_probe=8
        ).collect()
    }
    assert got == want


def test_ivf_append_disjoint_guard(dup_corpus):
    from pyspark.sql import functions as F

    a = dup_corpus.filter(F.col("vec_id") < 150)
    assigned_a, cents = similarity.build_ivf_index(
        a, "vec_id", "embedding", n_cells=8, seed=42
    )
    overlapping = dup_corpus.filter(F.col("vec_id") < 10)
    with pytest.raises(ValueError, match="disjoint"):
        similarity.ivf_append(
            overlapping, cents, "vec_id", "embedding", index=assigned_a
        ).count()


def test_ivf_append_dim_guard(dup_corpus, spark):
    """ADVICE r11: a batch from the wrong embedding space must fail
    driver-side with both dims named, not inside the assign kernel
    with an opaque numpy shape error (pq_append's first-row probe,
    mirrored)."""
    from pyspark.sql import functions as F

    a = dup_corpus.filter(F.col("vec_id") < 150)
    _, cents = similarity.build_ivf_index(a, "vec_id", "embedding", n_cells=8, seed=42)
    wrong = spark.createDataFrame(
        [(999, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dim 3 .*same embedding space"):
        similarity.ivf_append(wrong, cents, "vec_id", "embedding")


def test_ivf_centroid_contiguity_guard(dup_corpus):
    """ADVICE r11: the assign kernel indexes centroids by ROW POSITION,
    so a stored centroid frame with gapped/re-keyed cell ids must raise
    (in both ivf_append and ivf_query) instead of silently relabeling
    every assignment."""
    from pyspark.sql import functions as F

    a = dup_corpus.filter(F.col("vec_id") < 150)
    assigned, cents = similarity.build_ivf_index(
        a, "vec_id", "embedding", n_cells=8, seed=42
    )
    gapped = cents.filter(F.col("cell") != 3)  # drop one cell -> gap
    batch = dup_corpus.filter(F.col("vec_id") >= 150)
    with pytest.raises(ValueError, match="exactly 0\\.\\.6"):
        similarity.ivf_append(batch, gapped, "vec_id", "embedding")
    with pytest.raises(ValueError, match="filtered, re-keyed, or truncated"):
        similarity.ivf_query(batch, assigned, gapped, "vec_id", "embedding", k=2)


def test_pq_append_equals_encode_all_with_same_codebook(spark, tmp_path):
    """build(A) + append(B) == encode(A∪B with A's codebook), and
    pq_query over the appended index equals the all-at-once form —
    codebook round-tripped through parquet."""
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    a = emb.filter(F.col("vec_id") < 300)
    b = emb.filter(F.col("vec_id") >= 300)
    enc_a, cb = similarity.build_pq_index(a, "vec_id", "embedding", m=8, n_codes=16)
    cb.write.parquet(str(tmp_path / "cb"))
    stored_cb = spark.read.parquet(str(tmp_path / "cb"))

    appended = similarity.pq_append(b, stored_cb, "vec_id", "embedding", index=enc_a)
    grown = enc_a.unionByName(appended)
    direct = similarity._pq_encode(
        emb, similarity._codebook_array(stored_cb), "vec_id", "embedding"
    )

    def codes(df):
        return {r["n_id"]: tuple(r["codes"]) for r in df.collect()}

    assert codes(grown) == codes(direct)

    queries = emb.filter(F.col("vec_id") < 3)
    got = {
        (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
        for r in similarity.pq_query(
            queries, grown, stored_cb, emb, "vec_id", "embedding", k=3
        ).collect()
    }
    want = {
        (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
        for r in similarity.pq_query(
            queries, direct, stored_cb, emb, "vec_id", "embedding", k=3
        ).collect()
    }
    assert got == want


def test_pq_append_guards(spark):
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    a = emb.filter(F.col("vec_id") < 300)
    enc_a, cb = similarity.build_pq_index(a, "vec_id", "embedding", m=8, n_codes=16)
    with pytest.raises(ValueError, match="disjoint"):
        similarity.pq_append(
            emb.filter(F.col("vec_id") < 10), cb, "vec_id", "embedding", index=enc_a
        ).count()
    wrong_dim = spark.createDataFrame(
        [(99_999, [0.0] * 16)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dim"):
        similarity.pq_append(wrong_dim, cb, "vec_id", "embedding")


def test_ivf_query_clamps_excess_n_probe(dup_corpus):
    """ADVICE r10: n_probe beyond the stored cell count must clamp to
    probing every cell (== exact search over the index), not die in a
    numpy length mismatch."""
    from pyspark.sql import functions as F

    assigned, cents = similarity.build_ivf_index(
        dup_corpus, "vec_id", "embedding", n_cells=4, seed=42
    )
    queries = dup_corpus.filter(F.col("vec_id") < 2)
    over = similarity.ivf_query(
        queries, assigned, cents, "vec_id", "embedding", k=3, n_probe=99
    ).collect()
    exact = similarity.ivf_query(
        queries, assigned, cents, "vec_id", "embedding", k=3, n_probe=4
    ).collect()
    key = lambda rows: {(r["q_id"], r["rn"]): r["n_id"] for r in rows}
    assert key(over) == key(exact)


def test_pq_encode_ragged_vector_fails_with_offending_id(spark):
    """A batch whose FIRST vector fits the codebook but which hides a
    ragged vector later must fail inside the encode kernel with the
    offending id and length — never an opaque numpy vstack/reshape
    error (ADVICE follow-up to the r11 append API)."""
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    _, cb = similarity.build_pq_index(
        emb.filter(F.col("vec_id") < 200), "vec_id", "embedding", m=8, n_codes=16
    )
    dim = len(emb.select("embedding").first()[0])
    ragged = spark.createDataFrame(
        [(100_000, [0.0] * dim), (100_001, [0.0] * (dim - 3))],
        "vec_id long, embedding array<float>",
    ).coalesce(1)
    with pytest.raises(Exception, match="PQ encode"):
        similarity.pq_append(ragged, cb, "vec_id", "embedding").count()


def test_retrieval_eval_hand_case(spark):
    """r13 retrieval_eval: known overlap/MRR arithmetic — full overlap,
    partial overlap with the top-1 at candidate rank 3, zero overlap
    (still a row), a truth smaller than k (recall denominator =
    |truth|), and the k guard."""
    truth = spark.createDataFrame(
        # q1: truth 1,2,3 ; q2: truth 4,5,6 ; q3: truth 7,8 (short) ; q4: 9,10,11
        [(1, 1, 1), (1, 2, 2), (1, 3, 3),
         (2, 4, 1), (2, 5, 2), (2, 6, 3),
         (3, 7, 1), (3, 8, 2),
         (4, 9, 1), (4, 10, 2), (4, 11, 3)],
        "q_id long, n_id long, rn long",
    )
    cand = spark.createDataFrame(
        # q1: exact same set; q2: only the top-1, at rank 3;
        # q3: disjoint; q4: rank beyond k must be ignored
        [(1, 3, 1), (1, 1, 2), (1, 2, 3),
         (2, 99, 1), (2, 98, 2), (2, 4, 3),
         (3, 97, 1), (3, 96, 2), (3, 95, 3),
         (4, 9, 4)],
        "q_id long, n_id long, rn long",
    )
    got = {
        r["q_id"]: (r["n_overlap"], r["recall_at_k"], r["reciprocal_rank"])
        for r in similarity.retrieval_eval(truth, cand, k=3).collect()
    }
    assert got == {
        1: (3, 1.0, 1.0 / 2.0),       # top-1 item sits at cand rank 2
        2: (1, 1.0 / 3.0, 1.0 / 3.0),
        3: (0, 0.0, 0.0),             # zero-overlap query still emits
        4: (0, 0.0, 0.0),             # cand rank 4 > k ignored
    }
    with pytest.raises(ValueError, match="k must be"):
        similarity.retrieval_eval(truth, cand, k=0)


def test_lsh_bits_beyond_word_raise(spark):
    """r14 scale-sweep finding: bits > 64 silently wrapped the packed
    int64 signature (upper bands all bucket-0 — one giant bucket, 22x
    the wall at x10) instead of adding granularity. Both LSH surfaces
    must refuse; the knob rule is bits-per-band within 64 total."""
    import pytest

    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="1..64"):
        S.embedding_neardup_lsh(emb, "vec_id", "embedding", bits=96, bands=8, dim=2).collect()
    with pytest.raises(ValueError, match="1..64"):
        S.lsh_ann_topk(emb, emb, "vec_id", "embedding", bits=96, bands=8, dim=2).collect()
    with pytest.raises(ValueError, match="1..64"):
        S.lsh_ann_topk(emb, emb, "vec_id", "embedding", bits=0, bands=1, dim=2).collect()


def test_lsh_banding_split_guards(spark):
    """ADVICE r14: the 1..64 signature guard blessed bits=64 with
    bands=1, but bits_per_band=64 still dies downstream — banded()'s
    `% (1 << bits_per_band)` needs a Spark long literal and 2^64
    doesn't fit one. Both surfaces must refuse the split up front
    (and bands > bits, which leaves 0 bits per band); bits=64 with
    bands >= 2 stays a legal, working setting."""
    import pytest

    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="bands >= 2"):
        S.lsh_ann_topk(emb, emb, "vec_id", "embedding", bits=64, bands=1, dim=2)
    with pytest.raises(ValueError, match="bands >= 2"):
        S.embedding_neardup_lsh(emb, "vec_id", "embedding", bits=64, bands=1, dim=2)
    with pytest.raises(ValueError, match="at least 1 signature bit"):
        S.lsh_ann_topk(emb, emb, "vec_id", "embedding", bits=8, bands=16, dim=2)
    with pytest.raises(ValueError, match="bands must be"):
        S.embedding_neardup_lsh(emb, "vec_id", "embedding", bits=8, bands=0, dim=2)
    # the legal 64-bit split still runs end-to-end
    assert (
        S.lsh_ann_topk(emb, emb, "vec_id", "embedding", k=2, bits=64, bands=2, dim=2)
        .count()
        >= 0
    )


def test_lsh_knobs_encodes_measured_curve():
    """lsh_knobs (r15 — VERDICT r14 item 1) must reproduce the
    docs/SCALE.md measured ANN curve at its own anchor: at the sweep's
    2000-row fixture and the back-fitted p=0.608, a 0.9 recall target
    lands exactly on the measured (bits=64, bands=16) 4-b/band setting
    (measured recall@10 0.910; predicted 0.905), and the growth rule
    adds +1 bit/band per corpus doubling (the candidate-volume-flat
    rule the x10 sweep measured)."""
    import pytest

    from apache_hadoop_framework_for_peptide_identification_spark.operators.similarity import lsh_knobs

    k = lsh_knobs(2000, recall_target=0.9)
    assert (k["bits"], k["bands"], k["bits_per_band"]) == (64, 16, 4)
    assert 0.9 <= k["expected_recall"] < 0.92
    # the measured bands-4 point: expected recall ~= the observed 0.445
    k4 = lsh_knobs(2000, recall_target=0.4)
    assert k4["bands"] == 4 and abs(k4["expected_recall"] - 0.445) < 0.01
    # +1 bit/band per doubling past the anchor; never below it
    # (probed at a near-dup p — at the ANN default the grown bpb
    # correctly blows the 64-bit budget and raises, tested below)
    assert lsh_knobs(2000, 0.4, bit_agreement=0.9)["bits_per_band"] == 4
    assert lsh_knobs(4000, 0.4, bit_agreement=0.9)["bits_per_band"] == 5
    assert lsh_knobs(20000, 0.4, bit_agreement=0.9)["bits_per_band"] == 8
    assert lsh_knobs(50, 0.4, bit_agreement=0.9)["bits_per_band"] == 4
    # monotone: a higher target never needs fewer bands
    assert lsh_knobs(2000, 0.7)["bands"] >= lsh_knobs(2000, 0.4)["bands"]
    # beyond the 64-bit packed budget: refuse with guidance, never wrap
    with pytest.raises(ValueError, match="64-bit packed budget"):
        lsh_knobs(20000, recall_target=0.9)
    # near-dup workloads pass their measured (higher) bit agreement
    nd = lsh_knobs(20000, recall_target=0.9, bit_agreement=0.9)
    assert nd["bits"] <= 64 and nd["expected_recall"] >= 0.9
    # the returned pair always passes the operators' banding guards
    from apache_hadoop_framework_for_peptide_identification_spark.operators.similarity import (
        _validate_banding,
    )

    for n in (50, 2000, 4000, 20000):
        kk = lsh_knobs(n, recall_target=0.5, bit_agreement=0.9)
        assert _validate_banding(kk["bits"], kk["bands"], "t") == kk["bits_per_band"]
    for bad in (0.0, 1.0, -0.2):
        with pytest.raises(ValueError, match="recall_target"):
            lsh_knobs(2000, recall_target=bad)
    with pytest.raises(ValueError, match="n_rows"):
        lsh_knobs(0)
    # ADVICE r16 item 2: clamp=True must NEVER throw, even when the
    # growth rule's bits_per_band alone exceeds the 64-bit word (huge
    # n_rows) — bpb caps at 63 so one band always fits the signature.
    import warnings as _warnings

    for huge in (2000 * 2**60, 2000 * 2**62, 10**30):
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")
            kc = lsh_knobs(huge, recall_target=0.9, clamp=True)
        assert kc["bits"] <= 64 and kc["bits_per_band"] <= 63
        assert kc["bands"] >= 1
        assert _validate_banding(kc["bits"], kc["bands"], "t") == kc["bits_per_band"]


def test_auto_lsh_knobs_default_path(spark):
    """r16 (VERDICT r15 item 5): the knob rule is the DEFAULT, not an
    opt-in. (1) embedding_neardup_lsh with NO knobs on q114's
    twin-planted corpus recovers exactly the pairs the oracle-verified
    explicit (64, 8) configuration finds (recall_target high enough
    that the auto banding's twin-miss probability is ~1e-12);
    (2) lsh_knobs clamp mode warns and stays within 64 bits instead of
    raising; (3) explicit knobs below the measured spill curve warn
    when the corpus count is known; (4) half a knob pair raises."""
    import warnings

    import pytest
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity as S
    from apache_hadoop_framework_for_peptide_identification_spark.operators.similarity import lsh_knobs
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings").filter(F.col("vec_id") < 200)
    from apache_hadoop_framework_for_peptide_identification_spark.queries.llm import (
        _plant_embedding_twins,
    )

    corpus = _plant_embedding_twins(emb)
    explicit = sorted(
        (r["id_a"], r["id_b"])
        for r in S.embedding_neardup_lsh(
            corpus, "vec_id", "embedding", threshold=0.9, bits=64, bands=8
        ).collect()
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the default path must be warning-free here
        auto = sorted(
            (r["id_a"], r["id_b"])
            for r in S.embedding_neardup_lsh(
                corpus, "vec_id", "embedding", threshold=0.9, recall_target=0.999
            ).collect()
        )
    assert auto == explicit and len(auto) >= 200

    # lsh_knobs clamp: infeasible target degrades to <=64 bits, warned
    with pytest.warns(UserWarning, match="clamped"):
        k = lsh_knobs(20000, recall_target=0.9, clamp=True)
    assert k["bits"] <= 64 and k["bits_per_band"] == 8 and 0 < k["expected_recall"] < 0.9

    # lsh_knobs_volume reproduces BOTH r15 measured anchors: the ANN
    # sweep's (64, 16) at p=0.608/2000 rows, and the x10 knob-rule row
    # (64, 4) at the near-identical sizing p/40k rows (1.01 MB shuffled,
    # zero spill, all twins recovered)
    from apache_hadoop_framework_for_peptide_identification_spark.operators.similarity import (
        lsh_knobs_volume,
    )

    ann = lsh_knobs_volume(2000, recall_target=0.9, bit_agreement=0.608)
    assert (ann["bits"], ann["bands"]) == (64, 16)
    nd = lsh_knobs_volume(40000, recall_target=0.9, bit_agreement=0.955)
    assert (nd["bits"], nd["bands"]) == (64, 4)
    assert nd["expected_candidates"] < 100_000  # vs 21.9M at the curve rule
    # unreachable target: degrade within budget + loud warning
    with pytest.warns(UserWarning, match="degraded"):
        deg = lsh_knobs_volume(200000, recall_target=0.99, bit_agreement=0.608)
    assert deg["bits"] <= 64 and deg["expected_candidates"] <= 16 * 200000

    # candidate-volume guard: an explicit 2-bit/band signature at a 20k
    # corpus is the measured spill regime — must warn when n_rows known
    with pytest.warns(UserWarning, match="candidate pairs"):
        S.embedding_neardup_lsh(
            corpus, "vec_id", "embedding", threshold=0.9,
            bits=16, bands=8, n_rows=20000,
        )
    # half a knob pair is meaningless
    with pytest.raises(ValueError, match="BOTH bits and bands"):
        S.lsh_ann_topk(emb, emb, "vec_id", "embedding", bits=16)


def test_pq_query_candidate_frac_equals_absolute(spark):
    """candidate_frac (r15 — VERDICT r14 item 1: the measured
    'n_candidates is an ABSOLUTE budget that collapses recall at 10x'
    rule as API): at fixed N the fraction form must equal the absolute
    form row-for-row, with and without the caller-supplied
    corpus_rows shortcut; ambiguous/out-of-range budgets raise."""
    import pytest

    from tests.conftest import SF_ORACLE

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity

    emb = load_table(spark, SF_ORACLE, "embeddings")
    n = emb.count()
    encoded, cb = similarity.build_pq_index(emb, "vec_id", "embedding", m=8, n_codes=16)
    enc = encoded.localCheckpoint()
    queries = emb.limit(0).sparkSession.createDataFrame(
        emb.filter("vec_id < 3").collect(), emb.schema
    )
    ncand = max(10, n // 4)
    want = {
        (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
        for r in similarity.pq_query(
            queries, enc, cb, emb, "vec_id", "embedding", k=5, n_candidates=ncand
        ).collect()
    }
    frac = (ncand - 0.5) / n  # ceil lands exactly on ncand
    got_counted = {
        (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
        for r in similarity.pq_query(
            queries, enc, cb, emb, "vec_id", "embedding", k=5, candidate_frac=frac
        ).collect()
    }
    got_manifest = {
        (r["q_id"], r["rn"]): (r["n_id"], round(r["cos_sim"], 9))
        for r in similarity.pq_query(
            queries, enc, cb, emb, "vec_id", "embedding",
            k=5, candidate_frac=frac, corpus_rows=n,
        ).collect()
    }
    assert want == got_counted == got_manifest and len(want) > 0
    with pytest.raises(ValueError, match="not both"):
        similarity.pq_query(
            queries, enc, cb, emb, "vec_id", "embedding",
            k=5, n_candidates=ncand, candidate_frac=frac,
        )
    for bad in (0.0, 1.5, -0.1):
        with pytest.raises(ValueError, match="candidate_frac"):
            similarity.pq_query(
                queries, enc, cb, emb, "vec_id", "embedding", k=5, candidate_frac=bad
            )
    # corpus_rows without a fraction is a dead parameter — refuse it
    # rather than let the caller believe the manifest count is used
    with pytest.raises(ValueError, match="corpus_rows only participates"):
        similarity.pq_query(
            queries, enc, cb, emb, "vec_id", "embedding",
            k=5, n_candidates=ncand, corpus_rows=n,
        )
    # a zero/negative manifest count must raise, not degrade to k
    with pytest.raises(ValueError, match="row count must be >= 1"):
        similarity.pq_query(
            queries, enc, cb, emb, "vec_id", "embedding",
            k=5, candidate_frac=0.1, corpus_rows=0,
        )


def test_ivfpq_roundtrip_append_and_exactness(spark, tmp_path):
    """r16 IVF-PQ composition (VERDICT r15 item 6 — the FAISS
    production shape: IVF coarse cells + shared PQ residual codebook):
    (1) build → persist all three frames → reload → query equals the
    never-persisted one-shot form (double centroids round-trip parquet
    bit-exactly); (2) build(A) + ivfpq_append(B) equals encoding A∪B
    with A's frozen frames row-for-row; (3) the exactness config
    (probe every cell, keep every candidate) equals brute-force cosine
    top-k; (4) the disjoint-id / dim / mismatched-frames guards raise
    with named quantities; (5) one budget only (the pq_query rule)."""
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity as S
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    n = emb.count()
    enc, cents, cb = S.build_ivfpq_index(emb, "vec_id", "embedding",
                                         n_cells=8, m=8, n_codes=16)
    q = emb.filter(F.col("vec_id") < 8)

    # (3) exactness configuration == brute force
    exact = sorted(map(tuple, S.ivfpq_query(
        q, enc, cents, cb, emb, "vec_id", "embedding",
        k=5, n_probe=8, n_candidates=n,
    ).select("q_id", "n_id", "rn").collect()))
    truth = sorted(map(tuple, S.cosine_topk(emb, q, "vec_id", "embedding", k=5)
                       .select("q_id", "n_id", "rn").collect()))
    assert exact == truth and len(exact) == 40

    # (1) persist/reload equality at REAL knobs (pruning active)
    for name, df in (("enc", enc), ("cents", cents), ("cb", cb)):
        df.write.parquet(f"{tmp_path}/{name}")
    enc2 = spark.read.parquet(f"{tmp_path}/enc")
    cents2 = spark.read.parquet(f"{tmp_path}/cents")
    cb2 = spark.read.parquet(f"{tmp_path}/cb")
    live = sorted(map(tuple, S.ivfpq_query(
        q, enc, cents, cb, emb, "vec_id", "embedding", k=5, n_probe=3,
        candidate_frac=0.05,
    ).collect()))
    reload = sorted(map(tuple, S.ivfpq_query(
        q, enc2, cents2, cb2, emb, "vec_id", "embedding", k=5, n_probe=3,
        candidate_frac=0.05, corpus_rows=n,
    ).collect()))
    assert live == reload and len(live) > 0

    # (2) append == build-all with the same frozen frames
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    all_enc = {r["n_id"]: (r["cell"], tuple(r["codes"]))
               for r in S.ivfpq_append(emb, cents, cb, "vec_id", "embedding").collect()}
    split = {r["n_id"]: (r["cell"], tuple(r["codes"]))
             for r in S.ivfpq_append(a, cents, cb, "vec_id", "embedding")
             .unionByName(S.ivfpq_append(b, cents, cb, "vec_id", "embedding"))
             .collect()}
    assert all_enc == split and len(all_enc) == n

    # (4) guards
    overlap = S.ivfpq_append(a, cents, cb, "vec_id", "embedding")
    with pytest.raises(ValueError, match="present in both"):
        S.ivfpq_append(a, cents, cb, "vec_id", "embedding", index=overlap)
    bad_dim = emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    with pytest.raises(ValueError, match="dim 32"):
        S.ivfpq_append(bad_dim, cents, cb, "vec_id", "embedding")
    wrong_cb = cb.filter(F.col("subspace") < 4)  # decodes dim 32, cents dim 64
    with pytest.raises(ValueError, match="different indexes"):
        S.ivfpq_query(q, enc, cents, wrong_cb, emb, "vec_id", "embedding")
    # (5) one budget, never a silent winner
    with pytest.raises(ValueError, match="not both"):
        S.ivfpq_query(q, enc, cents, cb, emb, "vec_id", "embedding",
                      n_candidates=10, candidate_frac=0.1)
    with pytest.raises(ValueError, match="corpus_rows only"):
        S.ivfpq_query(q, enc, cents, cb, emb, "vec_id", "embedding",
                      n_candidates=10, corpus_rows=n)


def test_ivfpq_recall_form_matches_oracle(spark):
    """The r17 registry candidate verified the way the driver will
    verify it (queries/llm.py q200_ann_ivfpq_recall + Q200_ORACLE):
    closed-form centroids (q194 rule) + closed-form RESIDUAL codebook
    (q196 rule lifted to residual space), production ivfpq_append /
    ivfpq_query kernels at genuinely approximate knobs (n_probe=2 of
    8 cells, 25-candidate ADC budget), retrieval_eval reduction —
    hash-compared against the full SQL replay at sf0.001 AND sf0.01
    (the q196 pre-registration discipline, incl. its ADC tie-freedom
    check)."""
    from apache_hadoop_framework_for_peptide_identification_spark.queries.llm import (
        Q200_ORACLE,
        q200_ann_ivfpq_recall,
    )
    from tests.oracle import compare, duck_connection

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        spdf = q200_ann_ivfpq_recall(spark, sf_dir).toPandas()
        con = duck_connection(sf_dir)
        rep = compare(spdf, con.execute(Q200_ORACLE).df())
        con.close()
        assert rep["match"], (sf_dir, rep)
        assert len(spdf) == 20
        # genuinely approximate: recall must sit strictly inside (0, 1)
        # on average or the knobs stopped measuring anything
        mean_recall = float(spdf["recall_at_k"].mean())
        assert 0.0 < mean_recall < 1.0, mean_recall


def test_adc_precut_deterministic_under_ties(spark):
    """ADVICE r16 item 1: twin vectors encode to identical codes (same
    cell, same ADC score for every query), so when the candidate-budget
    boundary lands inside a tie group the per-partition pre-cut used to
    keep an ARBITRARY member — the survivor depended on the physical
    partitioning of ``encoded``. The cut now tie-breaks exactly like
    the global candidate window, (approx_ip desc, n_id asc), which is
    the necessary-and-sufficient condition for layout invariance: any
    element of the global top-N has < N elements ahead of it in the
    total order, hence < N in its own partition, so every local cut
    retains it. Doubles the fixture corpus (vec_id and vec_id+100000
    share an embedding), runs pq_query AND ivfpq_query over four
    physical layouts of the same encoded frame at a budget far below
    the tie-pair count, and asserts bit-identical results plus the
    lowest-n_id-wins rule inside surviving tie pairs."""
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity as S
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    twin = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(twin)
    q = emb.filter(F.col("vec_id") < 3)

    layouts = [
        lambda df: df.repartition(1),
        lambda df: df.repartition(13, "n_id"),
        lambda df: df.orderBy(F.col("n_id").desc()).coalesce(2),
        lambda df: df.repartition(7, "codes"),
    ]

    def check(results):
        assert all(r == results[0] for r in results[1:]), (
            "pre-cut survivors depend on the physical layout of encoded"
        )
        rows = results[0]
        assert rows, "empty result defeats the test"
        # lowest-n_id-wins inside a surviving tie pair: a +100000 twin in
        # the output implies its base sibling ranks strictly ahead of it
        # (the base can only be absent when it IS the query, which the
        # q_id != n_id filter removes while its twin scores cos=1.0).
        by_q: dict[int, dict[int, int]] = {}
        for q_id, n_id, rn in rows:
            by_q.setdefault(q_id, {})[n_id] = rn
        twins_seen = 0
        for q_id, ranks in by_q.items():
            for n_id, rn in ranks.items():
                if n_id >= 100000 and n_id - 100000 != q_id:
                    twins_seen += 1
                    assert ranks.get(n_id - 100000, 10**9) < rn, (q_id, n_id)
        assert twins_seen > 0, "no tie pair reached the output — weak fixture"

    enc_pq, cb_pq = S.build_pq_index(corpus, "vec_id", "embedding", m=8, n_codes=16)
    check([
        sorted(map(tuple, S.pq_query(
            q, lay(enc_pq), cb_pq, corpus, "vec_id", "embedding",
            k=8, n_candidates=20,
        ).select("q_id", "n_id", "rn").collect()))
        for lay in layouts
    ])

    enc_iv, cents, cb_iv = S.build_ivfpq_index(
        corpus, "vec_id", "embedding", n_cells=4, m=8, n_codes=16
    )
    check([
        sorted(map(tuple, S.ivfpq_query(
            q, lay(enc_iv), cents, cb_iv, corpus, "vec_id", "embedding",
            k=8, n_probe=2, n_candidates=20,
        ).select("q_id", "n_id", "rn").collect()))
        for lay in layouts
    ])


def test_topk_deterministic_equals_lexsort_reference():
    """_topk_deterministic (the O(n) ADC pre-cut) must select exactly
    the lexsort((ids, -scores))[:k] set — the (score desc, id asc)
    total order — on tie-heavy inputs: 3000 randomized trials over
    small integer score spaces (maximal tie pressure), every k. The
    O(n) shape is argpartition for the k-th score + boundary-tie fill
    by smallest id; this is the reference equivalence that makes the
    layout-invariance test above a property of the ORDER, not of one
    sort implementation."""
    import numpy as np

    from apache_hadoop_framework_for_peptide_identification_spark.operators.similarity import (
        _topk_deterministic,
    )

    rng = np.random.default_rng(7)
    for trial in range(3000):
        n = int(rng.integers(2, 60))
        k = int(rng.integers(1, n))
        scores = rng.integers(0, 6, size=n).astype(float)  # heavy ties
        ids = rng.permutation(n * 3)[:n]
        got = set(_topk_deterministic(scores, ids, k).tolist())
        ref = set(np.lexsort((ids, -scores))[:k].tolist())
        assert got == ref, (trial, scores.tolist(), ids.tolist(), k)
        assert len(got) == k
