"""Training-data-pipeline operators: repetition quality filters,
PII scrubbing, benchmark-contamination checks, deterministic
stratified sampling, and sequence packing.

These extend the LLM-data-pipeline group (SURVEY.md §2B) with the
corpus-preparation steps a 100 TB pretraining pipeline runs between
dedup and tokenization. Everything except sequence packing is pure
built-in expressions (whole-stage codegen, no Python); packing is
inherently sequential within a shard, so it is the one grouped-Pandas
op — see ``pack_sequences`` for the scale contract.
"""

from __future__ import annotations

from collections.abc import Mapping

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------- quality

def _toks(text_col: Column) -> Column:
    return F.split(text_col, " ")


def top_token_frac(text_col: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token —
    the Gopher-style "most common word" repetition signal. No shuffle
    (a per-row expression, unlike the explode+groupBy form which
    shuffles every token), and LINEAR per row: sort the tokens
    (native JVM sort_array), then one aggregate() fold tracking the
    longest equal-run. The obvious nested form —
    transform(array_distinct(t), d -> size(filter(t, x -> x = d))) —
    is O(n·distinct) *interpreted* lambda evaluation and measured 7x
    SLOWER than even the triple-shuffle explode+groupBy baseline at
    sf0.1; HOF lambdas don't codegen, so every lambda eval counts."""
    toks = _toks(text_col)
    run = F.aggregate(
        F.sort_array(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return (run["best"] / F.size(toks)).cast("double")


def _trigrams(toks: Column) -> Column:
    n = F.size(toks)
    tri = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    # Guard: sequence(1, n-2) COUNTS DOWN when n < 3 (Spark's sequence
    # defaults to step -1 when stop < start) — short docs must yield an
    # empty array, not a bogus descending index list.
    return F.when(n >= 3, tri).otherwise(F.array().cast("array<string>"))


def dup_trigram_frac(text_col: Column) -> Column:
    """Fraction of word trigrams that are repeats of an earlier trigram
    in the same document (1 - distinct/total) — the Gopher "duplicate
    n-gram" repetition signal. 0.0 for docs under 3 tokens; NULL for
    NULL text (size(NULL)=-1 would otherwise silently land in the
    0.0 branch, diverging from top_token_frac's NULL)."""
    tri = _trigrams(_toks(text_col))
    total = F.size(tri)
    frac = F.lit(1.0) - F.size(F.array_distinct(tri)) / total
    return (
        F.when(text_col.isNull(), F.lit(None))
        .when(total > 0, frac)
        .otherwise(F.lit(0.0))
        .cast("double")
    )


def repetition_stats(text_col: Column) -> Column:
    """Both repetition signals in ONE Arrow-batched pass — the hot
    path. Returns struct<top_tok_frac:double, dup_tri_frac:double>.

    Why a pandas UDF and not the pure-expression forms above: HOF
    lambdas (transform/filter/aggregate) are INTERPRETED per element —
    measured at sf0.1, building the trigram array alone cost 4.7 s and
    Catalyst does not common-subexpression-eliminate lambda trees, so
    a projection using a stat twice pays twice (the expression-form
    q83 measured 36 s vs 4.5 s for the triple-shuffle explode+groupBy
    baseline and ~0.6 s for this UDF). Python-per-token with Counter
    beats all of them while keeping the op shuffle-free; the
    expression forms stay available where a no-Python constraint
    outweighs speed."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<top_tok_frac: double, dup_tri_frac: double>")
    def _stats(texts: pd.Series) -> pd.DataFrame:
        from collections import Counter

        tops, dups = [], []
        for t in texts:
            if t is None:
                # match the expression forms (split(NULL) -> NULL ->
                # NULL fractions), not ''-coercion — a NULL doc must
                # not report top_tok_frac=1.0
                tops.append(None)
                dups.append(None)
                continue
            toks = t.split(" ")
            n = len(toks)
            tops.append(Counter(toks).most_common(1)[0][1] / n)
            if n >= 3:
                tris = list(zip(toks, toks[1:], toks[2:]))
                dups.append(1.0 - len(set(tris)) / len(tris))
            else:
                dups.append(0.0)
        return pd.DataFrame(
            {
                "top_tok_frac": pd.array(tops, dtype="Float64"),
                "dup_tri_frac": pd.array(dups, dtype="Float64"),
            }
        )

    return _stats(text_col)


# ------------------------------------------------------------------ PII

# Java-regex and RE2 compatible (no lookaround, no backrefs).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_ANY = f"{PII_EMAIL}|{PII_PHONE}|{PII_IPV4}"
PII_TOKEN = "<PII>"


def pii_count(text_col: Column) -> Column:
    """Number of PII matches (emails, US-style phone numbers, IPv4s)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(PII_ANY), 0)).cast("bigint")


def scrub_pii(text_col: Column) -> Column:
    """Replace every PII match with the redaction token. Pure
    regexp_replace — rides codegen; the pattern set is deliberately
    lookaround-free so the same regex runs under Java regex (Spark)
    and RE2 (DuckDB oracle, Go/Rust tooling)."""
    return F.regexp_replace(text_col, PII_ANY, PII_TOKEN)


# -------------------------------------------------------- contamination

def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-corpus-doc count of word n-grams that also appear in the
    benchmark (eval-set) corpus — the decontamination primitive.

    Scale: the benchmark side is small by definition (eval sets are
    KBs–MBs), so its distinct shingle set is broadcast; the corpus
    explodes to (id, shingle) and inner-joins the broadcast set with
    NO shuffle of corpus data. Corpus docs with zero overlap drop out
    of the join and are restored with a left join against the (tiny
    per-doc) overlap counts — at 100 TB the restore join shuffles only
    ids, never text.

    Returns (id_col, n_overlap) — one row per corpus doc.
    """
    def shingles(df: DataFrame) -> DataFrame:
        # ml.NGram (Scala transform) over the interpreted HOF tree —
        # 4x at sf0.1 (round 5); emits nothing for docs with <n tokens,
        # exactly the previous expression's semantics.
        from pyspark.ml.feature import NGram

        toks = df.select(
            F.col(id_col),
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("__toks"),
        )
        ng = NGram(n=n, inputCol="__toks", outputCol="__ng").transform(toks)
        return ng.select(F.col(id_col), F.explode(F.array_distinct("__ng")).alias("sh"))

    bench_sh = shingles(benchmark).select("sh").distinct()
    overlaps = (
        shingles(corpus)
        .join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select(id_col)
        .join(overlaps, id_col, "left")
        .select(F.col(id_col), F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"))
    )


def remove_reference_spans(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    pad: int = 0,
) -> DataFrame:
    """SPAN-LEVEL decontamination (r10): excise from each corpus doc
    every token covered by a word n-gram that also appears in the
    ``reference`` (eval) set — plus ``pad`` surrounding tokens each
    side, the GPT-3-style removal window — and reassemble the doc.
    The remover counterpart of :func:`contamination_overlap`, which
    only counts/flags: production decontamination prefers cutting the
    leaked span over dropping a long document that is 99% clean.
    Detection is ALIGNMENT-FREE (sliding n-grams, unlike the
    chunk-aligned exact_substring_dedup): a snippet leaked mid-sentence
    is found at any offset. A doc with fewer than ``n`` tokens cannot
    contain a full n-gram and is never modified — same boundary rule
    as contamination_overlap's shingle emitter.

    100 TB discipline (the q85/q177 composition): the reference's
    distinct n-gram hashes BROADCAST (eval sets are KBs–MBs by
    definition), so corpus text never shuffles for detection — the
    hash-join probe is map-side, and only HIT positions survive into
    the one shuffle ((id, position) pairs, grouped to one integer
    array per CONTAMINATED doc — output-proportional), joined back to
    the corpus by id with the token surgery as map-side lambda work on
    the already-joined row with interval-merged coverage (below).

    Removal is EXACT STRING matching, not hash matching (ADVICE r10):
    the broadcast frame carries each reference gram's 64-bit xxhash64
    AND the gram string, and the join condition requires both to
    match — the hash narrows the probe, the string equality vetoes
    collisions. At trillions of corpus grams × a large eval set the
    expected number of 2^-64 hash collisions is no longer zero, and a
    false positive here silently excises ~n+2·pad CLEAN tokens; the
    strings are cheap to carry because only the small-by-contract
    reference side carries them pre-join (the corpus side materializes
    its gram column map-side and drops it at the projection after the
    broadcast join — it never shuffles).

    Coverage is interval-merged (r12 — VERDICT r11 obs. 2, the q177/
    q182 twin): the sorted hit starts fold into disjoint [s, e]
    removal intervals map-side (each hit covers [x−pad, x+n−1+pad];
    touching windows merge), so the per-token check costs
    O(tokens × intervals) instead of O(tokens × hits) — a
    pathologically dense doc (every position a hit) collapses to ONE
    interval instead of ~tokens² comparisons.

    Returns (id, clean_text, n_removed) — n_removed counts removed
    TOKENS (0 for untouched docs).
    """
    from pyspark.ml.feature import NGram

    def posted(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col).alias("id"),
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("__toks"),
        )
        ng = NGram(n=n, inputCol="__toks", outputCol="__ng").transform(toks)
        return ng.select("id", F.posexplode("__ng").alias("i", "__g")).select(
            "id", "i", F.xxhash64("__g").alias("gh"), "__g"
        )

    ref_sh = posted(reference).select("gh", "__g").distinct()
    # Join on (hash, gram): the 8-byte hash is the probe key, the gram
    # string equality vetoes 2^-64 collisions that would otherwise
    # excise clean tokens (ADVICE r10). Broadcast side carries the
    # strings; the corpus side's gram column dies at this projection.
    hits = posted(corpus).join(F.broadcast(ref_sh), ["gh", "__g"]).select("id", "i")
    starts = hits.groupBy("id").agg(F.collect_list("i").alias("__starts"))
    d = corpus.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    joined = d.join(starts, "id", "left")
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    st = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    # Fold the sorted hit starts into disjoint removal intervals
    # map-side (r12): hit x covers [x-pad, x+n-1+pad]; a window
    # starting at or before the open interval's end+1 extends it,
    # otherwise a new interval opens. The accumulator stays one
    # element for a densely contaminated doc, so the fold is linear
    # there — and the coverage predicate below scans intervals, not
    # hits.
    lo, hi = pad, n - 1 + pad
    ivals = F.aggregate(
        F.array_sort(st),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & ((x - lo) <= F.element_at(acc, -1)["e"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(F.element_at(acc, -1)["e"], x + hi).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct((x - lo).alias("s"), (x + hi).alias("e"))),
            )
        ),
    )
    kept = F.filter(
        F.transform(toks, lambda tok, j: F.struct(tok.alias("t"), j.alias("j"))),
        lambda s: ~F.exists(ivals, lambda r: (r["s"] <= s["j"]) & (s["j"] <= r["e"])),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("clean_text"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    )


# ------------------------------------------------------------- sampling

def temperature_mixing(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_total: int,
    temperature: float = 0.5,
) -> DataFrame:
    """Temperature-based domain mixing (the multinomial-sampling scheme
    of XLM-R / mT5 / LLaMA data recipes): each stratum's share of the
    ``target_total``-document mix is proportional to count^temperature,
    so low-resource sources are up-weighted relative to their raw share
    (temperature<1 flattens the distribution; 1 = proportional,
    0 = uniform).

    Determinism contract (what makes this oracle-checkable): weights
    are count^τ quantized to 9 dp AS INTEGERS (floor(x*1e9+0.5) —
    sqrt/pow are correctly-rounded IEEE on both engines), the quota is
    the INTEGER division (target_total * w_int) div sum(w_int), and the
    kept rows are each stratum's quota-many smallest ids. Every step is
    exact integer arithmetic after the one quantized power.

    Scale: the per-stratum counts are one map-side-partial aggregate
    (rows = |strata|); quotas broadcast back. The keep step here is a
    per-stratum row_number window (validation form, exact); at 100 TB
    swap it for the stratified_mod_sample membership predicate with
    k_s = n_s div quota_s — no window, no skew, approximately-exact
    quotas — or global_sort_rank for exact quotas without a
    single-partition window.

    Returns (id_col, strata_col, quota) for the kept rows.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    # sqrt for tau=0.5: sqrt is correctly-rounded IEEE in both the JVM
    # and DuckDB's libm, pow(x, 0.5) is not guaranteed to be — the
    # quantized weight must be bit-identical across engines.
    powed = (
        F.sqrt(F.col("__n").cast("double"))
        if temperature == 0.5
        else F.pow(F.col("__n").cast("double"), F.lit(float(temperature)))
    )
    w_int = F.floor(powed * F.lit(1e9) + F.lit(0.5)).cast("long")
    weighted = counts.select(strata_col, "__n", w_int.alias("__w"))
    total = weighted.agg(F.sum("__w").alias("__tw"))
    quotas = (
        weighted.crossJoin(F.broadcast(total))
        .select(
            strata_col,
            F.expr(f"CAST({int(target_total)} * __w AS BIGINT) div __tw").alias("quota"),
        )
    )
    w = Window.partitionBy(strata_col).orderBy(id_col)
    ranked = df.select(id_col, strata_col).withColumn("__rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), strata_col)
        .filter(F.col("__rn") <= F.col("quota"))
        .select(id_col, strata_col, "quota")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    val_hex_threshold: str = "0ccccccccccccccc",
    salt: str = "split42",
) -> DataFrame:
    """Deterministic train/validation split: a row is 'val' iff
    md5(salt:id) is lexicographically below ``val_hex_threshold``
    (hex digits are uniform, so the threshold IS the val fraction —
    the default '0cccc…' ≈ 0.05). Properties that matter in a training
    pipeline, all by construction: disjoint and exhaustive (every row
    gets exactly one label), partitioning/run/cluster-invariant (pure
    row expression — no RNG state, no shuffle), and stable across
    re-ingests as long as ids are stable, so a document can never
    leak from val into train between runs. String comparison on hex is
    engine-portable — the oracle replays it verbatim."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return df.withColumn(
        "split", F.when(h < F.lit(val_hex_threshold), "val").otherwise("train")
    )


def stratified_mod_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    keep_1_in: Mapping[str, int],
    default_k: int = 10,
) -> DataFrame:
    """Deterministic stratified sampling: keep every k-th row per
    stratum (k from ``keep_1_in``), membership decided by
    ``id % k == 0``.

    This is the domain-mixing primitive (sample src A at 1/2, src B at
    1/7, ...) built so that it costs NOTHING at scale: membership is a
    pure per-row expression — no shuffle, no RNG state, no sampleBy
    two-pass — and the same row set is selected on any cluster, any
    partitioning, any run (seeded ``sample()``/``sampleBy()`` only
    guarantee that for identical partitioning). Ids must be unique for
    exact rates; correlated ids (e.g. all-even) skew the rate — use a
    hash of the id as the modulus base for adversarial id spaces.
    """
    k_map = F.create_map(
        *[F.lit(x) for pair in keep_1_in.items() for x in pair]
    )
    k = F.coalesce(F.element_at(k_map, F.col(strata_col)), F.lit(default_k))
    return df.filter(F.pmod(F.col(id_col), k) == 0)


def upsert_snapshot(
    base: DataFrame, updates: DataFrame, key_cols: list[str], delete_col: str | None = None
) -> DataFrame:
    """MERGE-INTO semantics on plain parquet frames: rows in ``updates``
    replace same-key rows in ``base``, new keys insert, and (when
    ``delete_col`` names a boolean column in updates) tombstones
    delete. Spark without a table format has no MERGE statement — the
    idiomatic replacement is ONE full-outer join on the key producing
    the next snapshot, which is exactly what table formats compile
    MERGE into.

    Scale: one shuffle of each side on the key (or zero for bucketed
    base tables); the snapshot rewrite is the copy-on-write cost every
    parquet-based MERGE pays — at 100 TB, partition the base by a key
    prefix and join only the partitions the update batch touches
    (partition pruning makes the rewrite proportional to touched
    partitions, not the table).

    Contract: ``updates`` must hold at most one row per key (compact
    CDC batches with a last-write-wins window first); duplicate update
    keys would multiply base rows through the join, exactly as SQL
    MERGE raises on multiple matches.
    """
    value_cols = [c for c in base.columns if c not in key_cols]
    upd_cols = [c for c in updates.columns if c not in key_cols and c != delete_col]
    # Set-compare (the merge below is by NAME, order is irrelevant) and
    # a real exception: an assert would vanish under `python -O` and
    # let a mismatched update schema proceed into the join.
    if set(upd_cols) != set(value_cols):
        raise ValueError(f"update columns {sorted(upd_cols)} != base {sorted(value_cols)}")
    u = updates.select(
        *key_cols,
        *[F.col(c).alias(f"__u_{c}") for c in value_cols],
        (F.col(delete_col) if delete_col else F.lit(False)).alias("__del"),
        F.lit(True).alias("__has_u"),
    )
    joined = base.join(u, key_cols, "full_outer")
    alive = joined.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    return alive.select(
        *key_cols,
        *[
            F.when(F.coalesce(F.col("__has_u"), F.lit(False)), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in value_cols
        ],
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str], compare_cols: list[str]
) -> DataFrame:
    """The INVERSE of upsert_snapshot: derive the change feed between
    two keyed snapshots — (keys, change_type ∈ added/removed/changed,
    old_/new_ values) — the CDC-extraction every load audit and
    incremental-downstream feed needs when the upstream only ships
    full snapshots. ONE full-outer join on the key (the exact shape
    table formats use for snapshot comparison); unchanged rows are
    dropped inside the join projection, so output is proportional to
    churn, not table size. NULL-safe comparison (``eqNullSafe``) —
    NULL→value and value→NULL both count as changed, NULL→NULL does
    not.

    Contract: each snapshot holds at most one row per key (it is a
    snapshot); duplicate keys would multiply through the join exactly
    as in upsert_snapshot."""
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_n"),
    )
    j = o.join(n, key_cols, "full_outer")
    in_o = F.coalesce(F.col("__in_o"), F.lit(False))
    in_n = F.coalesce(F.col("__in_n"), F.lit(False))
    # Empty compare_cols is a valid call (added/removed-only diff —
    # e.g. a membership audit): vacuously "same", so no key present in
    # both snapshots ever classifies as changed (ADVICE r8 item 1 —
    # previously `~None` raised an opaque TypeError).
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(~in_o, F.lit("added"))
        .when(~in_n, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return j.select(
        *key_cols,
        change.alias("change_type"),
        *[F.col(f"__o_{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"__n_{c}").alias(f"new_{c}") for c in compare_cols],
    ).filter(F.col("change_type").isNotNull())


def cap_per_group(df: DataFrame, group_col: str, order_col: str, n: int) -> DataFrame:
    """Keep at most ``n`` rows per group, by ``order_col`` order — the
    per-domain/source cap that web-corpus pipelines apply before
    mixing (one domain must not dominate the epoch). One shuffle on
    the group key; a hot group costs its own partition only up to the
    cap because the rank filter discards its tail. Adds ``rn``."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)


# ------------------------------------------------------------- ranking

def global_sort_rank(
    df: DataFrame,
    key_col: str,
    n_partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Distributed global 1-based rank by ``key_col`` — WITHOUT the
    single-partition collapse of a bare ``Window.orderBy`` (Spark
    funnels a partitionBy-less window through ONE task; at 100 TB that
    is the whole corpus through one executor).

    The standard two-phase form: range-repartition on the key (range
    boundaries are ordered, so partition id order == key order),
    compute per-partition counts (one tiny row per partition), turn
    them into exclusive prefix offsets, and add each partition's
    offset to its local row_number. Both heavy stages are fully
    parallel; the only serial step is the prefix sum over
    n_partitions rows.

    Keys must be distinct (ties across a range boundary would make
    rank assignment partitioner-dependent); use a unique tiebreak
    column in the key when in doubt.

    The partitioned frame is localCheckpoint'd before fanning into the
    two consumers (offset aggregation + final rank): without it each
    branch re-executes the range exchange, and AQE / range-boundary
    sampling may materialize DIFFERENT partitionings per branch, so
    the offsets would be keyed by partition ids the main branch never
    sees (observed as wrong ranks at sf0.1). The checkpoint holds only
    the projected columns — project narrow before ranking and join the
    result back by id if the full row is needed.

    ``checkpoint_mode`` (r19 — the localCheckpoint fault envelope,
    operators/reliability.py): unlike the keeper-sized sites, THIS
    checkpoint holds the whole projected corpus, so under the default
    ``"local"`` regime an executor loss during an hours-long ranked
    pass (epoch_shuffle over 100 TB) is job-fatal with the full
    range-exchange bill to re-pay. ``"replicated"`` doubles the
    residency of the projected bytes; ``"reliable"`` writes them
    through the DFS once AND materializes eagerly inside this call
    (reliable checkpoints are never lazy — reliability.materialize;
    the local/replicated regimes keep the lazy construction below) —
    both priced in SCALE.md. All three modes return identical rows
    (tests/test_reliability.py).
    """
    import numpy as np
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from .reliability import materialize as _mat

    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = _mat(
        df.repartitionByRange(n, key_col).sortWithinPartitions(key_col),
        checkpoint_mode,
        eager=False,
    )

    # Local positions via a NARROW mapInPandas pass (TaskContext gives
    # the partition id) — a Window.partitionBy(pid) here would insert a
    # second full hashpartitioning Exchange because Catalyst can't see
    # the rows are already clustered by pid; this keeps the range
    # exchange as the ONLY full-data shuffle.
    out_schema = StructType(
        list(parts.schema.fields)
        + [StructField("__pid", IntegerType()), StructField("__lpos", LongType())]
    )

    def tag(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__pid"] = np.int32(pid)
            pdf["__lpos"] = np.arange(seen + 1, seen + 1 + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    tagged = parts.mapInPandas(tag, out_schema)
    # One tiny row per partition; the groupBy's map-side partial means
    # the only thing shuffled here is (pid, count).
    offs = (
        tagged.groupBy("__pid")
        .agg(F.max("__lpos").alias("__cnt"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    return (
        tagged.join(F.broadcast(offs), "__pid")
        .withColumn("pos", (F.col("__lpos") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__lpos", "__off")
    )


def epoch_shuffle(
    df: DataFrame, id_col: str, epoch: int, checkpoint_mode: str = "local"
) -> DataFrame:
    """Deterministic epoch-reproducible global shuffle: rank rows by
    md5(epoch:id). Every run, any cluster, any partitioning produces
    the SAME permutation for a given epoch (unlike orderBy(rand)), and
    each epoch is a fresh permutation — the training-data ordering
    contract. Adds ``pos`` (1-based). ``checkpoint_mode`` passes
    through to global_sort_rank's corpus-sized checkpoint (its
    docstring prices the fault envelope — this is the canonical
    hours-long-100-TB-pass caller)."""
    key = F.md5(F.concat(F.lit(f"epoch{epoch}:"), F.col(id_col).cast("string")))
    return global_sort_rank(
        df.withColumn("__shuffle_key", key), "__shuffle_key",
        checkpoint_mode=checkpoint_mode,
    ).drop("__shuffle_key")


# --------------------------------------------------------- quantization

def quantize_embeddings_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5). Returns (id, scale, qvec
    array<tinyint>, max_abs_err).

    The ANN-at-scale memory lever: int8 cuts vector bytes (and every
    candidate-join shuffle that carries vectors) 4x vs float32 for
    ~1% cosine error at 64-dim. numpy-vectorized per Arrow batch;
    floor(x+0.5) instead of round() because banker's rounding differs
    between numpy and SQL engines — this exact formula is reproducible
    everywhere (oracle parity is the proof)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<scale: double, qvec: array<tinyint>, max_abs_err: double>")
    def _quant(vecs: pd.Series) -> pd.DataFrame:
        import numpy as np

        scales, qvecs, errs = [], [], []
        for v in vecs:
            v32 = np.asarray(v, dtype=np.float32)
            v64 = v32.astype(np.float64)
            scale = float(np.max(np.abs(v32))) / 127.0 if len(v32) else 0.0
            safe = scale if scale != 0.0 else 1.0
            q = np.floor(v64 / safe + 0.5).astype(np.int8)
            err = float(np.max(np.abs(v64 - q.astype(np.float64) * scale))) if len(v32) else 0.0
            scales.append(scale)
            qvecs.append(q.tolist())
            errs.append(err)
        return pd.DataFrame({"scale": scales, "qvec": qvecs, "max_abs_err": errs})

    out = df.select(F.col(id_col), _quant(F.col(vec_col)).alias("s"))
    return out.select(
        id_col,
        F.col("s")["scale"].alias("scale"),
        F.col("s")["qvec"].alias("qvec"),
        F.col("s")["max_abs_err"].alias("max_abs_err"),
    )


# -------------------------------------------------------------- packing

def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Greedy sequence packing: walk each group in ``order_col`` order
    and assign docs to consecutive bins (seq_id), opening a new bin
    whenever adding the next doc would exceed ``budget`` tokens. A doc
    larger than the budget occupies a bin alone.

    Packing is sequential BY DEFINITION inside a bin stream, so this is
    honestly a grouped-Pandas op, not a window trick (a running-sum
    window cannot express the capacity RESET). The 100 TB contract:
    packing never needs global order — shard the corpus (the group key
    here), pack each shard independently in parallel, and the group
    key keeps the op deterministic for the oracle. State per task is
    one (fill, seq_id) pair — O(1) memory over any shard size.

    Returns (group_col, order_col, size_col, seq_id).
    """
    if budget <= 0:
        raise ValueError(
            f"pack_sequences: budget must be >= 1 token, got {budget} — a "
            "non-positive budget silently degrades to one-doc bins after the "
            "first row instead of failing (loud-guard rule, the r14 LSH bits "
            "precedent)"
        )
    schema = (
        df.select(group_col, order_col, size_col)
        .withColumn("seq_id", F.lit(0).cast("bigint"))
        .schema
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # mergesort = stable: rows sharing an order value keep a
        # deterministic relative order (quicksort would make bin
        # assignment arrival-order-dependent on duplicate keys; for a
        # fully deterministic contract use a unique order column).
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        seq_ids = []
        fill, seq = 0, 0
        for sz in pdf[size_col]:
            if fill and fill + sz > budget:
                seq += 1
                fill = 0
            fill += sz
            seq_ids.append(seq)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        return pdf

    return (
        df.select(group_col, order_col, size_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema)
    )


def _exact_keeper_ids(keyed: DataFrame) -> DataFrame:
    """The exact-hash keeper reduction of :func:`dedup_mix_pack`,
    factored so its plan shape is pinnable in isolation (the final
    composition eager-checkpoints the keeper set, so this subtree never
    appears in the returned plan): ``min(__id)`` per packed ladder key
    ``k_n`` — a map-side-combinable aggregate whose single exchange
    carries (k_n, partial min) and nothing else; Catalyst prunes every
    other input column (``norm`` included) below the exchange. No sort,
    no window — the r17 form's keeper WINDOW shuffled the full row and
    re-executed per consumer (VERDICT r17 "What's wrong")."""
    return keyed.groupBy("k_n").agg(F.min("__id").alias("__id")).select("__id")


def _keeper_rows(keyed: DataFrame, broadcast_keepers: bool) -> DataFrame:
    """The keeper-row subtree of :func:`dedup_mix_pack` — reduction +
    id semi-join — factored UN-checkpointed so BOTH join modes' plan
    shapes are pinnable in isolation (r19, VERDICT r18 item 4: the
    composition checkpoints this frame, so the semi-join never appears
    in the returned plan). Default: broadcast semi-join, 8-byte longs
    on the wire, ``norm`` crosses no keyed exchange. Fallback
    (``broadcast_keepers=False``, beyond the ~10^8–10^9-keeper
    broadcast reach): co-shuffle semi-join — ``norm`` rides exactly
    ONE hashpartitioning(__id) exchange, and the keeper reduction
    still runs exactly once (one k_n exchange), pinned by
    tests/test_pipeline_ops.py::test_keeper_fallback_plan_discipline."""
    keeper_ids = _exact_keeper_ids(keyed)
    if broadcast_keepers:
        keeper_ids = F.broadcast(keeper_ids)
    return keyed.join(keeper_ids, "__id", "left_semi").select(
        "__id", "__topic", "n_tok", "norm"
    )


def dedup_mix_pack(
    surv: DataFrame,
    id_col: str = "rec_id",
    topic_col: str = "topic",
    text_col: str = "clean_text",
    neardup_threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    target_total: int = 30,
    temperature: float = 0.5,
    budget: int = 128,
    max_bucket: int | None = None,
    broadcast_keepers: bool = True,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """The corpus-build DOWNSTREAM as one reusable composition (r17 —
    factored verbatim out of q201 so its batch form and the streaming
    crawl store's finalization run literally the same code): crawl
    survivors (id, topic, text) through the q195 dedup-ladder tiers —
    Unicode NFC → casefold/punct/whitespace normalization → exact-hash
    min-id keeper → MinHash-LSH near-dup keeper pruning — then
    temperature mixing over the topic strata and greedy sequence
    packing. Returns (id_col, topic_col, n_tok, quota, seq_id).
    ``max_bucket`` passes through to the near-dup stage's LSH
    candidate join (r18): the 100 TB hot-bucket cap — a boilerplate
    band bucket larger than this is dropped before the pair join,
    bounding per-bucket work at max_bucket² (see
    minhash_lsh_candidates; None = uncapped, the fixture default).

    Scale shape (r18 — VERDICT r17 "What's wrong" fix; the q195
    ladder's own discipline applied here): one corpus pass to the
    ladder checkpoint (the localCheckpoint pins the pandas-UDF NFC
    pass to a single execution); ONE map-side-combinable keeper
    reduction — ``groupBy(k_n).agg(min(__id))`` over the packed
    16-byte binary key, no sort, no text aboard (the r17 form ran a
    keeper WINDOW whose exchange shipped ``norm`` and executed 3×
    across the fan-out); winners re-join the checkpointed frame
    through a broadcast id semi-join (8-byte longs — the q195
    keeper-id shape) and the keeper set materializes ONCE before its
    ≥6-consumer fan-out (minhash candidates, both shingle sides, both
    size aggregates, the corpus path); keeper-sized near-dup stage
    with md5-hashed shingle postings, strata-sized mixing aggregates,
    shard-parallel packing. Normalized text crosses exactly one
    RoundRobin work-spreading repartition (inside minhash signatures)
    and NO keyed exchange — pinned structurally on a multi-partition
    checkpoint by tests/test_pipeline_ops.py.

    ``broadcast_keepers`` (r18 review finding): the keeper-id set is
    one 8-byte long per distinct normalized document — broadcastable
    to roughly 10^8–10^9 keepers (Spark's 8 GB broadcast-table hard
    limit / driver memory). Beyond that reach, set False: the
    semi-join falls back to a co-shuffle, which ships ``norm``
    through exactly ONE keyed exchange — a deliberate, documented
    trade (still 3× better than the r17 window form, which keyed-
    exchanged norm AND re-ran the keeper window per consumer), the
    same archive-sized-broadcast refusal the crawl store's seed path
    makes. The text-never-keyed-exchanged pin holds for the default
    mode only.

    ``checkpoint_mode`` (r19 — VERDICT r18 "What's wrong": the
    localCheckpoint fault envelope): both corpus-sized
    materializations here — the post-NFC ``keyed`` frame and the
    ``keep`` keeper set — are lineage truncations, so under the
    default ``"local"`` regime their blocks live only in executor
    caches and ANY executor loss after materialization is job-fatal
    (nothing left to recompute from). On an hours-long 100 TB build
    pass ``"replicated"`` (2× executor replicas, survives single
    loss) or ``"reliable"`` (DFS checkpoint via
    ``sc.setCheckpointDir``, survives any loss — the frames here are
    the SMALL mid-pipeline survivors, so the DFS tax is bounded).
    Regime table: operators/reliability.py + SCALE.md; all three
    modes return identical rows (parity-pinned by
    tests/test_reliability.py). Block residency (ADVICE r18): the
    ``keyed`` checkpoint is read only until ``keep`` materializes,
    but local-checkpoint blocks have no public PySpark release handle
    — they are freed by the ContextCleaner once the frame is GC'd
    (end of this call). Sessions running MANY finalization builds
    back-to-back should prefer ``"reliable"``, whose blocks live on
    DFS instead of executor memory."""
    from . import dedup as D
    from . import text as T
    from .reliability import materialize as _mat

    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("nfc")), "[^\\p{L}\\p{N} ]", ""),
            " +",
            " ",
        )
    )
    keyed = (
        surv.select(
            F.col(id_col).alias("__id"),
            F.col(topic_col).alias("__topic"),
            F.col(text_col).alias("__text"),
        )
        .withColumn("nfc", T.unicode_normalize(F.col("__text")))
        .select(
            "__id",
            "__topic",
            F.size(F.split(F.col("__text"), " ")).cast("long").alias("n_tok"),
            norm.alias("norm"),
            # packed 16-byte binary key, not the 32-char hex (q177)
            F.unhex(F.md5(norm)).alias("k_n"),
        )
    )
    # one pandas-UDF execution (the q195 rule); durability per the knob
    keyed = _mat(keyed, checkpoint_mode)
    # materialize once before the minhash fan-out
    keep = _mat(_keeper_rows(keyed, broadcast_keepers), checkpoint_mode)
    pairs = D.minhash_jaccard_pairs(
        keep, "__id", "norm", threshold=neardup_threshold,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        max_bucket=max_bucket,
    )
    losers = pairs.select(F.col("id_b").alias("__id")).distinct()
    corpus = keep.join(losers, "__id", "left_anti").select(
        "__id", "__topic", "n_tok"
    )
    mixed = temperature_mixing(
        corpus, strata_col="__topic", id_col="__id",
        target_total=target_total, temperature=temperature,
    ).join(corpus.select("__id", "n_tok"), "__id")
    packed = pack_sequences(mixed, "__topic", "__id", "n_tok", budget=budget)
    return (
        mixed.join(packed.select("__topic", "__id", "seq_id"), ["__topic", "__id"])
        .select(
            F.col("__id").alias(id_col),
            F.col("__topic").alias(topic_col),
            "n_tok",
            "quota",
            "seq_id",
        )
    )
