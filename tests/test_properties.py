"""Property-based spot checks (SURVEY.md §5.2 item 5): random small
frames through engine operators vs pandas reference semantics.
max_examples kept low — each example is a Spark job; these are
structure probes, not fuzzing marathons."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),  # key
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),  # v
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),  # x
    ),
    min_size=0,
    max_size=50,
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(rows=rows_strategy, threshold=st.integers(min_value=-5, max_value=5))
@SETTINGS
def test_filter_count_matches_pandas(sess, rows, threshold):
    df = sess.createDataFrame(rows, "k int, v long, x double") if rows else None
    if df is None:
        return
    got = df.filter(F.col("k") > threshold).count()
    pdf = pd.DataFrame(rows, columns=["k", "v", "x"])
    assert got == int((pdf.k > threshold).sum())


@given(rows=rows_strategy)
@SETTINGS
def test_groupby_sum_matches_pandas_null_semantics(sess, rows):
    """SQL sum skips NULLs and returns NULL for all-NULL groups —
    pandas sum(min_count=1) reproduces that."""
    if not rows:
        return
    df = sess.createDataFrame(rows, "k int, v long, x double")
    got = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"))
        .collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "v", "x"])
    for k, grp in pdf.groupby("k"):
        s = grp.v.sum(min_count=1)
        expected = (None if pd.isna(s) else int(s), int(grp.v.notna().sum()))
        assert got[k] == expected, (k, got[k], expected)


@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=5))
@SETTINGS
def test_topk_is_sorted_prefix(sess, rows, k):
    if not rows:
        return
    df = sess.createDataFrame(rows, "k int, v long, x double")
    got = [r["x"] for r in df.orderBy(F.col("x").desc()).limit(k).collect()]
    expected = sorted((r[2] for r in rows), reverse=True)[:k]
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert math.isclose(g, e, rel_tol=1e-9, abs_tol=1e-12)


@given(rows=rows_strategy)
@SETTINGS
def test_distinct_union_roundtrip(sess, rows):
    """unionByName(df, df).distinct() == df.distinct() — set semantics."""
    if not rows:
        return
    df = sess.createDataFrame(rows, "k int, v long, x double")
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    a = sorted(map(tuple, df.unionByName(df).distinct().collect()), key=nullsafe)
    b = sorted(map(tuple, df.distinct().collect()), key=nullsafe)
    assert a == b


@given(
    left=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), max_size=30),
    right=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), max_size=30),
)
@SETTINGS
def test_inner_join_multiset_matches_pandas(sess, left, right):
    """Inner equi-join is a multiset product per key — row multiplicity
    must match pandas merge exactly."""
    if not left or not right:
        return
    l = sess.createDataFrame(left, "k int, a long")
    r = sess.createDataFrame(right, "k int, b long")
    got = sorted(map(tuple, l.join(r, "k").select("k", "a", "b").collect()))
    lp = pd.DataFrame(left, columns=["k", "a"])
    rp = pd.DataFrame(right, columns=["k", "b"])
    expected = sorted(map(tuple, lp.merge(rp, on="k")[["k", "a", "b"]].itertuples(index=False)))
    assert got == expected


@given(
    left=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), max_size=30),
    right=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), max_size=30),
)
@SETTINGS
def test_left_anti_join_matches_set_difference(sess, left, right):
    if not left:
        return
    l = sess.createDataFrame(left, "k int, a long")
    r = (
        sess.createDataFrame(right, "k int, b long")
        if right
        else sess.createDataFrame([], "k int, b long")
    )
    got = sorted(map(tuple, l.join(r, "k", "left_anti").collect()))
    right_keys = {k for k, _ in right}
    expected = sorted((k, a) for k, a in left if k not in right_keys)
    assert got == expected


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(-100, 100)), max_size=40))
@SETTINGS
def test_row_number_matches_pandas_rank(sess, rows):
    """row_number over (partition, order with tie-break) must equal the
    pandas first-method rank on the same deterministic key."""
    if not rows:
        return
    from pyspark.sql import Window

    df = sess.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v long, uid long"
    )
    w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("uid"))
    got = {
        r["uid"]: r["rn"]
        for r in df.select("uid", F.row_number().over(w).alias("rn")).collect()
    }
    pdf = pd.DataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], columns=["k", "v", "uid"]
    )
    pdf = pdf.sort_values(["k", "v", "uid"], ascending=[True, False, True])
    pdf["rn"] = pdf.groupby("k").cumcount() + 1
    expected = dict(zip(pdf.uid, pdf.rn))
    assert got == expected


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=500),
)
@SETTINGS
def test_pack_sequences_matches_python_reference(sess, sizes, budget):
    """Greedy packing vs a plain-Python reference walk: same bins for
    any size sequence and budget, including oversize docs."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    df = sess.createDataFrame(
        [("g", i, s) for i, s in enumerate(sizes)], "grp string, ord long, n long"
    )
    got = {r["ord"]: r["seq_id"] for r in P.pack_sequences(df, "grp", "ord", "n", budget).collect()}
    fill, seq, want = 0, 0, {}
    for i, s in enumerate(sizes):
        if fill and fill + s > budget:
            seq += 1
            fill = 0
        fill += s
        want[i] = seq
    assert got == want
    # invariant: no bin exceeds budget unless it holds a single oversize doc
    from collections import defaultdict

    bins = defaultdict(list)
    for i, s in enumerate(sizes):
        bins[got[i]].append(s)
    for members in bins.values():
        assert sum(members) <= budget or len(members) == 1


@given(
    vec=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    )
)
@SETTINGS
def test_quantize_int8_roundtrip_bound(sess, vec):
    """For any float32 vector: int8 codes in range, scale = max|x|/127,
    and reconstruction error bounded by scale/2."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    df = sess.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    r = P.quantize_embeddings_int8(df).collect()[0]
    assert all(-128 <= q <= 127 for q in r["qvec"])
    assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9


@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=6),
    target=st.integers(min_value=10, max_value=300),
)
@SETTINGS
def test_temperature_mixing_quota_invariants(sess, counts, target):
    """For any strata layout: quotas never exceed the per-stratum
    population, their sum never exceeds the target (floor division),
    and the kept set is exactly the quota-many smallest ids per
    stratum."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    rows = [
        (s * 100_000 + i, f"s{s}") for s, n in enumerate(counts) for i in range(n)
    ]
    df = sess.createDataFrame(rows, "doc_id long, source string")
    out = P.temperature_mixing(df, "source", "doc_id", target_total=target).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    total_kept = 0
    for s, n in enumerate(counts):
        grp = by_src.get(f"s{s}", [])
        if grp:
            quota = grp[0]["quota"]
            assert len(grp) == min(quota, n)
            # smallest ids kept
            assert max(r["doc_id"] for r in grp) == s * 100_000 + len(grp) - 1
            total_kept += len(grp)
    assert total_kept <= target


@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                    max_size=60, unique=True))
@SETTINGS
def test_hash_split_disjoint_exhaustive_stable(sess, ids):
    """Every row gets exactly one label; re-running (and re-ingesting a
    subset) never flips a label — the leak-proof property."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    df = sess.createDataFrame([(i,) for i in ids], "doc_id long")
    lab1 = {r["doc_id"]: r["split"] for r in P.hash_split(df, "doc_id").collect()}
    assert set(lab1) == set(ids)
    assert set(lab1.values()) <= {"train", "val"}
    half = sess.createDataFrame([(i,) for i in ids[::2]], "doc_id long")
    lab2 = {r["doc_id"]: r["split"] for r in P.hash_split(half, "doc_id").collect()}
    assert all(lab1[i] == lab2[i] for i in lab2)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(30)]), min_size=1, max_size=90
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@SETTINGS
def test_passage_chunking_reassembles_exactly(sess, texts):
    """q145's invariant: stitching each doc's chunks back together —
    first chunk whole, later chunks contributing their last `stride`
    tokens — reproduces the original token sequence exactly, and no
    chunk exceeds `size` tokens. Holds for any doc length including
    shorter-than-one-window docs."""
    from pyspark.sql import functions as F2

    size, stride = 32, 24
    df = sess.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    toks = F2.split(F2.col("text"), " ")
    n_chunks = F2.greatest(
        F2.ceil((F2.size(toks) - F2.lit(size)) / F2.lit(float(stride))) + 1, F2.lit(1)
    ).cast("int")
    chunks = (
        df.select(
            "doc_id",
            toks.alias("__toks"),
            F2.explode(F2.sequence(F2.lit(0), n_chunks - 1)).alias("ci"),
        )
        .select(
            "doc_id",
            "ci",
            F2.slice(F2.col("__toks"), F2.col("ci") * stride + 1, size).alias("chunk"),
        )
        .collect()
    )
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["ci"])):
        assert 1 <= len(r["chunk"]) <= size
        acc = by_doc.setdefault(r["doc_id"], [])
        if r["ci"] == 0:
            acc.extend(r["chunk"])
        else:
            # chunks overlap by size - stride tokens; the new content
            # is the part beyond the overlap
            overlap = size - stride
            assert acc[-overlap:] == r["chunk"][:overlap] or len(r["chunk"]) < overlap
            acc.extend(r["chunk"][overlap:] if len(r["chunk"]) >= overlap else [])
    for i, t in enumerate(texts):
        assert by_doc[i] == t.split(" "), f"doc {i} reassembly mismatch"


@given(
    names=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=8), min_size=2, max_size=25
    )
)
@SETTINGS
def test_fuzzy_name_pairs_complete_vs_brute_force(sess, names):
    """q140's length banding must produce EXACTLY the brute-force
    levenshtein <= k pair set — no pair lost to the band explode, no
    spurious distances — on arbitrary short strings (where distances
    cluster near the threshold and off-by-ones would show)."""
    import itertools

    from apache_hadoop_framework_for_peptide_identification_spark.operators import dedup

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    uniq = sorted(set(names))
    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if lev(a, b) <= 3
    }
    df = sess.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r["name_a"], r["name_b"], r["lev"])
        for r in dedup.fuzzy_name_pairs(df, "p_name", max_dist=3).collect()
    }
    assert got == want


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=0,
        max_size=40,
    )
)
@SETTINGS
def test_triangle_count_matches_brute_force(sess, edges):
    """q133's degree-orientation logic vs brute force on random small
    multigraphs (self-loops, duplicates, both directions): every
    triangle counted exactly once — orientation off-by-ones double- or
    zero-count and show up immediately at this density."""
    import itertools

    from apache_hadoop_framework_for_peptide_identification_spark.operators.graph import (
        triangle_count,
    )

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in simple for n in e})
    want = sum(
        1
        for u, v, w in itertools.combinations(nodes, 3)
        if (u, v) in simple and (u, w) in simple and (v, w) in simple
    )
    df = sess.createDataFrame(
        [(str(a), str(b)) for a, b in edges] or [("x", "x")],
        "src string, dst string",
    )
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == want
    assert row["n_edges"] == len(simple)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=0,
            max_size=10,
        ),
        min_size=0,
        max_size=12,
    ),
    threshold=st.sampled_from([0.5, 0.75, 0.9, 1.0]),
)
@SETTINGS
def test_containment_prefix_pairs_complete_vs_brute_force(sess, docs, threshold):
    """q165's asymmetric prefix filter must produce EXACTLY the
    brute-force containment >= t ORDERED pair set — no pair lost to
    the prefix shortening or the |B| size prune, no spurious scores —
    on arbitrary tiny-vocabulary docs (where shingle sets collide
    heavily and every boundary case of ceil(t*n) shows). Mirrors the
    engine's shingle rule: distinct 2-gram shingles; docs shorter than
    the shingle width contribute their whole text; empty docs emit
    nothing."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import dedup

    n = 2

    def shingle_set(toks):
        if not toks:
            return set()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingle_set(t) for i, t in enumerate(docs)}
    want = set()
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            c = len(sa & sb) / len(sa)
            if c >= threshold:
                want.add((a, b, round(c, 9)))

    rows = [(i, " ".join(t)) for i, t in enumerate(docs) if t]
    if not rows:
        return
    df = sess.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], round(r["containment"], 9))
        for r in dedup.containment_prefix_pairs(
            df, "doc_id", "text", n=n, threshold=threshold
        ).collect()
    }
    assert got == want


@given(
    old_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        min_size=0,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    new_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        min_size=0,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
)
@SETTINGS
def test_snapshot_diff_upsert_round_trip(sess, old_rows, new_rows):
    """snapshot_diff and upsert_snapshot are inverses (r9): applying
    the change feed diff(old→new) to `old` — upsert added+changed,
    delete removed — must reproduce `new` EXACTLY, for arbitrary keyed
    snapshots including NULL values and NULL→value / value→NULL
    transitions. This is the algebraic contract a CDC consumer relies
    on; any misclassification (a changed row reported unchanged, a
    NULL-comparison slip) breaks the round trip."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    old = sess.createDataFrame(old_rows or [(99, None)], "k int, v string")
    new = sess.createDataFrame(new_rows or [(98, None)], "k int, v string")
    if not old_rows:
        old = old.filter("k < 0")
    if not new_rows:
        new = new.filter("k < 0")

    diff = P.snapshot_diff(old, new, ["k"], ["v"]).collect()
    changes = sess.createDataFrame(
        [
            (r["k"], r["new_v"], r["change_type"] == "removed")
            for r in diff
        ]
        or [(97, None, False)],
        "k int, v string, is_delete boolean",
    )
    if not diff:
        changes = changes.filter("k < 0")
    rebuilt = {
        r["k"]: r["v"]
        for r in P.upsert_snapshot(old, changes, ["k"], delete_col="is_delete").collect()
    }
    want = dict(new_rows)
    assert rebuilt == want


@given(
    big_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key: 0 is usually hot
            st.integers(min_value=0, max_value=1000),  # payload/salt source
        ),
        min_size=0,
        max_size=40,
    ),
    small_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # includes keys big lacks
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    hot_threshold=st.sampled_from([1, 3, 10**6]),
)
@SETTINGS
def test_hot_key_two_path_join_equals_plain_property(
    sess, big_rows, small_rows, how, hot_threshold
):
    """q173's operator contract under arbitrary tiny frames, every
    supported mode, and every hot/cold boundary (threshold 1 = all
    keys hot ⇒ degenerates to salted_join; 10^6 = none hot ⇒
    degenerates to the plain join; 3 = a genuine mixed split):
    union(hot⋈hot, cold⋈cold) == plain join as an exact multiset."""
    from collections import Counter

    from apache_hadoop_framework_for_peptide_identification_spark.operators.skew import hot_key_salted_join

    big = sess.createDataFrame(big_rows or [(99, 0)], "k int, payload int")
    small = sess.createDataFrame(small_rows or [(99, 0)], "k int, dim int")
    if not big_rows:
        big = big.filter("k < 0")
    if not small_rows:
        small = small.filter("k < 0")

    plain = Counter(map(tuple, big.join(small, ["k"], how).collect()))
    two_path = Counter(
        map(
            tuple,
            hot_key_salted_join(
                big, small, on=["k"], salt_cols=["payload"], buckets=4,
                how=how, hot_row_threshold=hot_threshold,
            ).collect(),
        )
    )
    assert two_path == plain


@given(
    lists=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=20),  # retrieved ids, dups pruned below
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    ),
    k_const=st.sampled_from([1, 60]),
    topk=st.sampled_from([3, 10]),
)
@SETTINGS
def test_rrf_fuse_matches_brute_force(sess, lists, k_const, topk):
    """rrf_fuse vs a literal reimplementation: for arbitrary ranked
    lists (each deduped to one row per id, rank = position), the fused
    scores, the (score desc, id) ordering, and the top-k cut must all
    agree. Scores compare after round-6-significant-digit
    canonicalization — the same rule the driver's comparator applies."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators.similarity import rrf_fuse

    ranked = []
    truth: dict[int, float] = {}
    for lst in lists:
        seen = []
        for i in lst:
            if i not in seen:
                seen.append(i)
        ranked.append(
            sess.createDataFrame(
                [(d, r + 1) for r, d in enumerate(seen)] or [(999, 1)],
                "doc_id int, rnk int",
            ).filter("doc_id < 900" if not seen else "doc_id >= 0")
        )
        for r, d in enumerate(seen):
            truth[d] = truth.get(d, 0.0) + 1.0 / (k_const + r + 1)

    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    got = [
        (r["doc_id"], r["rrf"])
        for r in rrf_fuse(ranked, "doc_id", "rnk", k_const=k_const, topk=topk).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), (gd, gs, ws)


# --- r10: span operators vs pure-Python references --------------------

_span_docs = st.lists(
    st.lists(
        st.sampled_from([f"w{i}" for i in range(6)]),  # tiny vocab => real repeats
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=10,
)


def _py_exact_substring_dedup(docs, k=4, min_run=2):
    """Brute-force reference: same keeper/run/tail rules, plain dicts."""
    chunks = {}  # doc idx -> [chunk strings]
    tails = {}
    for d, toks in enumerate(docs):
        n = len(toks) // k
        chunks[d] = [" ".join(toks[i * k : i * k + k]) for i in range(n)]
        tails[d] = toks[n * k :]
    first = {}
    for d in sorted(chunks):
        for p, c in enumerate(chunks[d]):
            first.setdefault(c, (d, p))
    out = {}
    for d in sorted(chunks):
        dup = [p for p, c in enumerate(chunks[d]) if first[c] != (d, p)]
        removed = set()
        run = []
        for p in dup + [None]:
            if run and (p is None or p != run[-1] + 1):
                if len(run) >= min_run:
                    removed.update(run)
                run = []
            if p is not None:
                run.append(p)
        kept = [c for p, c in enumerate(chunks[d]) if p not in removed]
        out[d] = (" ".join(kept + ([" ".join(tails[d])] if tails[d] else [])
                           if kept else ([" ".join(tails[d])] if tails[d] else [])),
                  len(removed))
    return out


@given(docs=_span_docs)
@SETTINGS
def test_exact_substring_dedup_matches_brute_force(sess, docs):
    from apache_hadoop_framework_for_peptide_identification_spark.operators import dedup

    rows = [(d, " ".join(toks)) for d, toks in enumerate(docs)]
    df = sess.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.exact_substring_dedup(
            df, "doc_id", "text", chunk_tokens=4, min_run=2
        ).collect()
    }
    # Spark's split(" ") of "" yields [""] — mirror by treating an
    # empty doc as one empty token in the reference.
    ref_docs = [toks if toks else [""] for toks in docs]
    want = _py_exact_substring_dedup(ref_docs, k=4, min_run=2)
    assert got == want, (got, want)


def _py_remove_reference_spans(corpus, ref_grams, n=3, pad=1):
    out = {}
    for d, toks in corpus.items():
        hits = [
            i
            for i in range(len(toks) - n + 1)
            if tuple(toks[i : i + n]) in ref_grams
        ]
        covered = set()
        for i in hits:
            covered.update(range(max(0, i - pad), min(len(toks), i + n + pad)))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[d] = (" ".join(kept), len(toks) - len(kept))
    return out


@given(
    corpus=_span_docs,
    ref=st.lists(
        st.lists(st.sampled_from([f"w{i}" for i in range(6)]), min_size=0, max_size=12),
        min_size=1,
        max_size=3,
    ),
)
@SETTINGS
def test_remove_reference_spans_matches_brute_force(sess, corpus, ref):
    from apache_hadoop_framework_for_peptide_identification_spark.operators import pipeline as P

    n, pad = 3, 1
    crows = [(d, " ".join(toks)) for d, toks in enumerate(corpus)]
    rrows = [(d, " ".join(toks)) for d, toks in enumerate(ref)]
    cdf = sess.createDataFrame(crows, "doc_id long, text string")
    rdf = sess.createDataFrame(rrows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in P.remove_reference_spans(cdf, rdf, n=n, pad=pad).collect()
    }
    # Mirror Spark's split(""): empty text -> one empty token.
    ctoks = {d: (toks if toks else [""]) for d, toks in enumerate(corpus)}
    ref_grams = set()
    for toks in ref:
        rt = toks if toks else [""]
        for i in range(len(rt) - n + 1):
            ref_grams.add(tuple(rt[i : i + n]))
    want = _py_remove_reference_spans(ctoks, ref_grams, n=n, pad=pad)
    assert got == want, (got, want)


def _py_sliding_substring_dedup(docs, C=4, min_span=8):
    """Brute-force reference for sliding_substring_dedup: sliding
    C-token windows, corpus-order first occurrence keeps, consecutive
    duplicate positions form runs, runs of >= min_span - C + 1 windows
    remove their covered tokens."""
    occ = {}
    for d, toks in enumerate(docs):
        for p in range(len(toks) - C + 1):
            occ.setdefault(" ".join(toks[p : p + C]), []).append((d, p))
    dup = {d: set() for d in range(len(docs))}
    for lst in occ.values():
        if len(lst) < 2:
            continue
        first = min(lst)
        for o in lst:
            if o != first:
                dup[o[0]].add(o[1])
    w_min = max(1, min_span - C + 1)
    out = {}
    for d, toks in enumerate(docs):
        ps = sorted(dup[d])
        runs, cur = [], []
        for p in ps:
            if cur and p == cur[-1] + 1:
                cur.append(p)
            else:
                if cur:
                    runs.append(cur)
                cur = [p]
        if cur:
            runs.append(cur)
        rm = set()
        for r in runs:
            if len(r) >= w_min:
                for p in r:
                    rm.update(range(p, p + C))
        kept = [t for j, t in enumerate(toks) if j not in rm]
        out[d] = (" ".join(kept), len(toks) - len(kept))
    return out


@given(docs=_span_docs)
@SETTINGS
def test_sliding_substring_dedup_matches_brute_force(sess, docs):
    from apache_hadoop_framework_for_peptide_identification_spark.operators import dedup

    rows = [(d, " ".join(toks)) for d, toks in enumerate(docs)]
    df = sess.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.sliding_substring_dedup(
            df, "doc_id", "text", window_tokens=4, min_span_tokens=8
        ).collect()
    }
    ref_docs = [toks if toks else [""] for toks in docs]
    want = _py_sliding_substring_dedup(ref_docs, C=4, min_span=8)
    assert got == want, (got, want)


# --- registered_domain_psl vs a pure-Python PSL reference (r11) ------------

_PSL_LABELS = ["a", "b", "co", "uk", "jp", "x"]


def _psl_reference(host: str, rules: list[str]) -> str:
    """The published publicsuffix.org algorithm, straightforwardly:
    exception match wins (suffix = rule minus first label), else the
    longest matching rule (wildcard * consumes exactly one label),
    else the default rule (suffix = last label). Registered domain =
    suffix + one label; hosts not longer than their suffix pass whole."""
    labels = host.split(".")
    n = len(labels)

    def matches(rule: str) -> bool:
        r = rule.split(".")
        if len(r) > n:
            return False
        tail = labels[n - len(r):]
        return all(rp == "*" or rp == hp for rp, hp in zip(r, tail))

    exc = [r[1:] for r in rules if r.startswith("!") and matches(r[1:])]
    if exc:
        ps = max(len(r.split(".")) for r in exc) - 1
    else:
        lit = [r for r in rules if not r.startswith("!") and matches(r)]
        ps = max((len(r.split(".")) for r in lit), default=1)
    reg = ps + 1
    return host if n <= ps else ".".join(labels[n - reg:])


hosts_strategy = st.lists(
    st.lists(st.sampled_from(_PSL_LABELS), min_size=1, max_size=4).map(".".join),
    min_size=1,
    max_size=8,
    unique=True,
)
rules_strategy = st.lists(
    st.builds(
        lambda exc, wc, labs: ("!" if exc and not wc else "")
        + ("*." if wc else "")
        + ".".join(labs),
        st.booleans(),
        st.booleans(),
        st.lists(st.sampled_from(_PSL_LABELS), min_size=1, max_size=3),
    ),
    min_size=1,
    max_size=6,
    unique=True,
)


@given(hosts=hosts_strategy, rules=rules_strategy)
@SETTINGS
def test_registered_domain_psl_matches_reference(sess, hosts, rules):
    from apache_hadoop_framework_for_peptide_identification_spark.operators import urls as U

    psl = sess.createDataFrame([(r,) for r in rules], "rule string")
    df = sess.createDataFrame(
        [(i, f"http://{h}/p") for i, h in enumerate(hosts)], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: r["domain"]
        for r in U.registered_domain_psl(df, "url", "doc_id", psl).collect()
    }
    want = {i: _psl_reference(h, rules) for i, h in enumerate(hosts)}
    assert got == want


# --- robots.txt matcher vs pure-Python reference (r13) -----------------------
# The q181-PSL discipline applied to the compliance layer: random robots
# corpora (multi-UA groups, '*' groups, wildcard/$/metachar rule paths,
# case-varied ported hosts) and random URLs, resolved by a pure-Python
# reference implementing the DOCUMENTED semantics — group selection in
# both ua_match modes, longest-match-wins with Allow tie-break, default
# allow — and compared verdict-for-verdict with parse_robots+robots_filter.

import re as _re


def _ref_rule_regex(rule: str) -> str:
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    out = "".join(".*" if ch == "*" else _re.escape(ch) for ch in body)
    return "^" + out + ("$" if anchored else "")


def _ref_parse(text: str, ua: str, mode: str):
    lines = []
    for line in text.split("\n"):
        line = _re.sub(r"#.*", "", line.replace("\r", "")).strip()
        m = _re.match(r"^([A-Za-z\-]+)\s*:(.*)$", line)
        if not m:
            continue
        d, v = m.group(1).lower(), m.group(2).strip()
        if d in ("user-agent", "allow", "disallow", "crawl-delay"):
            lines.append((d, v))
    groups, cur, prev_ua = [], None, False
    for d, v in lines:
        if d == "user-agent":
            if not prev_ua:
                cur = ([], [], [])
                groups.append(cur)
            cur[0].append(v)
            prev_ua = True
        else:
            # any group-member line (rule OR crawl-delay) ends a UA run
            prev_ua = False
            if cur is None or v == "":
                continue
            if d == "crawl-delay":
                cur[2].append(v)
            else:
                cur[1].append((v, d == "allow"))
    if mode == "exact":
        def mlen(v):
            return len(v) if v.lower() == ua.lower() else -1
    else:
        tok = ua.split("/", 1)[0].strip().lower()

        def mlen(v):
            return (
                len(v) if v and v != "*" and tok.startswith(v.lower()) else -1
            )
    best = max(
        (max((mlen(v) for v in g[0]), default=-1) for g in groups), default=-1
    )
    rules, delays = [], []
    if best >= 0:
        for g in groups:
            if max((mlen(v) for v in g[0]), default=-1) == best:
                rules += g[1]
                delays += g[2]
    else:
        for g in groups:
            if "*" in g[0]:
                rules += g[1]
                delays += g[2]
    # narrower than Spark's try_cast by design ('.5', '1d', 'NaN',
    # 'Infinity' rejected) — the engine's finite/non-negative filter
    # makes the two agree on every value the generator above renders
    valid = [float(x) for x in delays
             if _re.fullmatch(r"[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?", x)]
    return rules, (max(valid) if valid else None)


def _ref_allowed(path: str, rules) -> bool:
    best_len, best_allow = -1, True
    for rp, allow in set(rules):
        if _re.match(_ref_rule_regex(rp), path):
            ln = len(rp)
            if ln > best_len or (ln == best_len and allow and not best_allow):
                best_len, best_allow = ln, allow
    return best_allow


def _fold_host(h: str) -> str:
    return _re.sub(r":[0-9]+$", "", h.strip().lower())


_RB_PATH_CHARS = "abx/.*$\\"
_rb_path = st.text(alphabet=_RB_PATH_CHARS, min_size=1, max_size=6).map(
    lambda s: "/" + s
)
_rb_group = st.tuples(
    st.lists(
        st.sampled_from(["bota", "BotA", "botb", "bot", "*"]),
        min_size=1, max_size=2,
    ),
    st.lists(st.tuples(_rb_path, st.booleans()), min_size=0, max_size=3),
)
_rb_texts = st.dictionaries(
    st.sampled_from(["a.com", "A.COM", "b.com:443", "C.com"]),
    st.lists(_rb_group, min_size=1, max_size=3),
    min_size=1, max_size=3,
)
_rb_urls = st.lists(
    st.tuples(
        st.sampled_from(["a.com", "A.com", "a.com:8080", "b.com", "c.COM", "d.com"]),
        _rb_path,
    ),
    min_size=1, max_size=8,
)


@given(
    texts=_rb_texts,
    urls=_rb_urls,
    ua=st.sampled_from(["bota/1.0", "BotA", "botb", "botx/2"]),
    mode=st.sampled_from(["exact", "prefix"]),
)
@SETTINGS
def test_robots_matcher_matches_reference(sess, texts, urls, ua, mode):
    from apache_hadoop_framework_for_peptide_identification_spark.operators import robots as R

    def render(groups):
        out = []
        for gi, (uas, rules) in enumerate(groups):
            out += [f"User-agent: {u}" for u in uas]
            if gi % 2:  # group-body directive that is NOT a rule: must
                # end UA runs, add no rule; value varies incl. malformed
                # and NaN (gi is odd here, so index by gi // 2 — a gi %
                # 4 index could only ever reach two of the cells)
                vals = ["5", "0.5", "fast", "-3", "NaN"]
                out.append(f"Crawl-delay: {vals[(gi // 2) % len(vals)]}")
            out += [("Allow: " if a else "Disallow: ") + p for p, a in rules]
            out.append("")
        return "\n".join(out)

    corpus = {h: render(g) for h, g in texts.items()}
    rules_df = R.parse_robots(
        sess.createDataFrame(list(corpus.items()), "host string, robots_txt string"),
        user_agent=ua,
        ua_match=mode,
    )
    url_rows = [(f"https://{h}{p}",) for h, p in urls]
    got = {
        r["url"]: r["crawl_allowed"]
        for r in R.robots_filter(
            sess.createDataFrame(url_rows, "url string"), rules_df
        ).collect()
    }
    # reference: fold rule hosts, merge rule lists across fold-equal keys
    folded: dict[str, list] = {}
    for h, text in corpus.items():
        folded.setdefault(_fold_host(h), []).extend(_ref_parse(text, ua, mode)[0])
    want = {}
    for h, p in urls:
        want[f"https://{h}{p}"] = _ref_allowed(p, folded.get(_fold_host(h), []))
    assert got == want
    # parse_crawl_delay against the same reference (group-scoped,
    # malformed/negative drop, MAX across selected groups)
    got_d = {
        r["host"]: r["crawl_delay"]
        for r in R.parse_crawl_delay(
            sess.createDataFrame(
                list(corpus.items()), "host string, robots_txt string"
            ),
            user_agent=ua,
            ua_match=mode,
        ).collect()
    }
    want_d = {}
    for h, text in corpus.items():
        d = _ref_parse(text, ua, mode)[1]
        if d is not None and d >= 0:
            want_d[h] = max(want_d.get(h, d), d)
    assert got_d == want_d


# --- sitemap frontier walk vs pure-Python BFS reference (r13) ----------------
# Random fetch graphs (indexes with arbitrary child edges incl. cycles,
# self-references, unfetched children, and MIXED documents carrying both
# page entries and child references) walked by a reference BFS with the
# documented semantics: level-synchronous, visited-once, bounded depth,
# pages tagged with the level they were found at.

_fg_nodes = st.integers(min_value=1, max_value=6)


@st.composite
def _frontier_graphs(draw):
    n = draw(_fg_nodes)
    nodes = {}
    for i in range(n):
        children = draw(
            st.lists(st.integers(min_value=0, max_value=n - 1), max_size=3)
        )
        n_pages = draw(st.integers(min_value=0, max_value=2))
        fetched = draw(st.booleans())
        nodes[i] = (children, n_pages, fetched)
    seeds = draw(
        st.lists(st.integers(min_value=0, max_value=n - 1), min_size=1, max_size=3)
    )
    depth = draw(st.integers(min_value=1, max_value=4))
    return nodes, seeds, depth


@given(graph=_frontier_graphs())
@SETTINGS
def test_sitemap_frontier_matches_bfs_reference(sess, graph):
    from apache_hadoop_framework_for_peptide_identification_spark.operators import urls as U

    nodes, seeds, max_depth = graph
    url = lambda i: f"s://n{i}"  # noqa: E731
    rows = []
    for i, (children, n_pages, fetched) in nodes.items():
        if not fetched:
            continue
        xml = "".join(
            f"<url><loc>s://p{i}-{j}</loc></url>" for j in range(n_pages)
        ) + "".join(f"<sitemap><loc>{url(c)}</loc></sitemap>" for c in children)
        rows.append((url(i), f"<x>{xml}</x>"))
    if not rows:
        rows = [("s://unused", "<x></x>")]
    fetched_df = sess.createDataFrame(rows, "url string, xml string")
    seeds_df = sess.createDataFrame(
        [(url(i),) for i in seeds], "sitemap_url string"
    )
    got = {
        (r["source_sitemap"], r["loc"], r["depth"])
        for r in U.sitemap_frontier(
            fetched_df, seeds_df, max_depth=max_depth
        ).collect()
    }
    # reference BFS
    want = set()
    frontier = {url(i) for i in seeds}
    visited = set(frontier)
    fetched_map = {
        url(i): (children, n_pages)
        for i, (children, n_pages, fetched) in nodes.items()
        if fetched
    }
    for depth in range(max_depth):
        if not frontier:
            break
        level = [u for u in frontier if u in fetched_map]
        for u in level:
            children, n_pages = fetched_map[u]
            i = int(u.split("n")[1])
            for j in range(n_pages):
                want.add((u, f"s://p{i}-{j}", depth))
        if depth + 1 >= max_depth:
            break
        nxt = {url(c) for u in level for c in fetched_map[u][0]} - visited
        visited |= nxt
        frontier = nxt
    assert got == want


@given(
    per_query=st.lists(
        st.tuples(
            st.permutations(list(range(10))),  # truth order
            st.integers(min_value=1, max_value=8),  # truth length
            st.permutations(list(range(10))),  # candidate order
            st.integers(min_value=0, max_value=8),  # candidate length
        ),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=6),
)
@SETTINGS
def test_retrieval_eval_matches_reference(sess, per_query, k):
    """retrieval_eval (r13/r14 — the instrument behind q193/q194 and
    the docs/SCALE.md recall curves) vs a pure-Python reference on
    random rankings: per query, overlap of the two rank<=k prefixes,
    recall = overlap / |truth prefix| (the min(k, |truth|)
    denominator), and the reciprocal candidate rank of the truth
    top-1 (0.0 when absent). Every truth query must emit a row even
    with an empty candidate list."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity as S

    t_rows, c_rows = [], []
    for q, (t_perm, t_len, c_perm, c_len) in enumerate(per_query):
        for rn, nid in enumerate(t_perm[:t_len], start=1):
            t_rows.append((q, nid, rn))
        for rn, nid in enumerate(c_perm[:c_len], start=1):
            c_rows.append((q, nid, rn))
    schema = "q_id long, n_id long, rn long"
    truth = sess.createDataFrame(t_rows, schema)
    cand = (
        sess.createDataFrame(c_rows, schema)
        if c_rows
        else sess.createDataFrame([], schema)
    )
    got = {
        r["q_id"]: (r["n_overlap"], r["recall_at_k"], r["reciprocal_rank"])
        for r in S.retrieval_eval(truth, cand, k=k).collect()
    }
    expected = {}
    for q, (t_perm, t_len, c_perm, c_len) in enumerate(per_query):
        t_pref = t_perm[: min(t_len, k)]
        c_pref = c_perm[: min(c_len, k)]
        c_rank = {nid: rn for rn, nid in enumerate(c_pref, start=1)}
        overlap = sum(1 for nid in t_pref if nid in c_rank)
        rr = 1.0 / c_rank[t_pref[0]] if t_pref[0] in c_rank else 0.0
        expected[q] = (overlap, overlap / len(t_pref), rr)
    assert set(got) == set(expected)
    for q in expected:
        eo, er, err_ = expected[q]
        go, gr, grr = got[q]
        assert go == eo and math.isclose(gr, er) and math.isclose(grr, err_), (
            q, got[q], expected[q]
        )
