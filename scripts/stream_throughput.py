#!/usr/bin/env python
"""Streaming ingest throughput: the last unmeasured surface.

Batch has BENCH_r{N}, exponents, recall curves, and byte audits; the
streaming operators' performance story was structural only. This
script measures the two numbers a 100 TB streaming deployment needs:

- **Per-micro-batch fixed cost** — the batch-sizing rule. A fixed doc
  corpus is split into B source files and drained with
  maxFilesPerTrigger=1 under one availableNow run (B micro-batches);
  the slope of wall vs B is the per-batch overhead (keeper-store
  read-back + pandas-UDF launch + 4 store writes for the ladder),
  and docs/s at each B shows where amortization wins.
- **The store-fragmentation tax** — both ingest operators append one
  ``batch_id=N`` partition per batch to every store and re-read the
  whole store next batch, so a long-running stream reads O(B²) store
  partitions. The sweep holds N fixed while B grows: any wall growth
  beyond the linear per-batch overhead IS the fragmentation tax, the
  measured motivation for periodic store compaction (the same
  pattern as the batch sink-compaction operator).

Operators measured: stream_neardup_ingest (q180's machinery) and
stream_dedup_ladder (q197's full NFC→casefold→exact→near-dup ladder).
Corpus: the first N sf0.1 documents plus one planted near-dup per 10
docs (so every batch does real dedup work, not just store writes).

Method: one warm-up drain per operator at the smallest B (fresh
dirs), then a single timed drain per (operator, B) — each timed run
uses FRESH src/store/checkpoint dirs so store state never leaks
across settings. Wall is end-to-end drain time of ALL B batches.

Usage: python scripts/stream_throughput.py [--docs 2000]
         [--batches 1,4,16,64] [--compact-probe B]
--compact-probe B (r15, after compact_ingest_store landed): runs the
near-dup ingest twice at B batches — once straight through, once
draining the first half, compacting the store through batch B/2-2,
then draining the rest — and reports the wall delta. The benefit is
the avoided O(B²) partition reads in the second half; it grows with
stream lifetime, so the probe's B should be large (256+) for a
quotable number. With --crawl (r19 — VERDICT r18 item 6) the same
probe runs against stream_crawl_ingest's url_keepers store,
completing the payback-table parity with the neardup store.
Prints a markdown table + one JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _run_compact_probe(drain_fn, b, metric, n_rows, spark, label=""):
    """Shared compact-probe harness (crawl + neardup stores share the
    exact protocol; only the drain callable and metric name differ):
    warm-up, an uncompacted B-batch drain, then the same drain
    stop-compacting once at B/2, one JSON line out. ``drain_fn(b,
    compact_at=None)`` must return the timed wall seconds."""
    if b < 8:
        sys.exit(
            f"stream_throughput: --compact-probe {b} is degenerate — the "
            "mid-stream horizon (B/2 - 2) needs B >= 8 to merge anything; "
            "a quotable tax number wants 256+"
        )
    drain_fn(8)  # session warm-up, untimed (b >= 8 guarded above)
    plain = drain_fn(b)
    print(f"{label}compact-probe B={b} uncompacted: {plain:.1f} s", flush=True)
    compacted = drain_fn(b, compact_at=b // 2)
    print(f"{label}compact-probe B={b} compact@B/2: {compacted:.1f} s", flush=True)
    spark.stop()
    print(json.dumps({
        "metric": metric, "sf_dir": SF_DIR, "docs": n_rows,
        "batches": b, "uncompacted_s": round(plain, 1),
        "compacted_s": round(compacted, 1),
    }))


def _crawl_mode(args, batch_counts: list[int]) -> None:
    """stream_crawl_ingest throughput (r17 — the crawl store's own
    per-batch floor and fragmentation reading, the treatment the
    neardup/ladder operators got in r15): N 200-OK WARC records (one
    per sf0.1 document) plus one higher-quality RE-CRAWL of the same
    canonical URL per 10 docs — so every batch performs genuine keeper
    REPLACEMENTS against the accumulated store, not just inserts —
    split into B source files, drained availableNow with one file per
    micro-batch through one checkpoint. Wall is the full drain; the
    per-batch cost is the keeper-store slim re-read + window + the
    changed-rows write."""
    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.operators import warc as W
    from apache_hadoop_framework_for_peptide_identification_spark.session import get_spark
    from apache_hadoop_framework_for_peptide_identification_spark.streaming import crawl as C

    spark = get_spark("stream-throughput-crawl")
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < args.docs)
    )
    crlf = "\r\n"
    # The 1_000_001 offset only disambiguates re-crawl ids from
    # originals; batch placement is assigned EXPLICITLY in drain() via
    # _crawl_file_idx (ADVICE r17: an id-offset placement scheme must
    # be ≡ 1 mod every swept B, and 1_000_001 ≡ 65 (mod 256) — at
    # B=256 ~25% of re-crawls landed in an EARLIER file than their
    # original and degraded to insert-then-losing-re-sight instead of
    # exercising cross-batch replacement).
    recrawl = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_001).alias("doc_id"),
        F.col("text"),
    )
    both = docs.unionByName(recrawl)
    url_id = F.when(
        F.col("doc_id") >= 1_000_000, F.col("doc_id") - 1_000_001
    ).otherwise(F.col("doc_id"))
    payload = F.concat(
        F.lit("HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" + crlf + crlf
              + "<html><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    rec = F.concat(
        F.lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf
              + "WARC-Record-ID: <urn:doc:"),
        F.col("doc_id").cast("string"),
        F.lit(">" + crlf + "WARC-Target-URI: https://t.example.com/u"),
        url_id.cast("string"),
        F.lit(crlf + "Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(crlf + crlf),
        payload,
        F.lit(crlf + crlf),
    )
    # one collect for the whole fixture (bounded by --docs): the
    # per-file writes below are plain python, not one Spark job per
    # source file (B jobs per drain at B=256 otherwise)
    all_rows = both.select("doc_id", rec.alias("rec")).collect()
    n_rows = len(all_rows)

    rid = W.warc_header(F.col("record"), "WARC-Record-ID")
    id_expr = F.regexp_extract(rid, r"urn:doc:(\d+)", 1).cast("long")
    # re-crawls always outrank their original: genuine replacements
    qual = F.when(F.col("rec_id") >= 1_000_000, F.lit(1000)).otherwise(
        F.col("rec_id") % 100
    )

    def _crawl_file_idx(doc_id: int, n_batches: int) -> int:
        """Source-file index: originals split on doc_id mod B;
        re-crawls are placed in the file AFTER their original's,
        explicitly (ADVICE r17 — see the offset comment above). The
        +1 never wraps FOR THE SWEPT B ≥ 2 (ADVICE r18 qualifier):
        originals are multiples of 10 (even), swept Bs are powers of
        two ≥ 2, so original_batch ≤ B-2 and every re-crawl genuinely
        arrives in a LATER micro-batch, replacing against the
        accumulated store. At B=1 the +1 trivially wraps to file 0 —
        re-crawl and original co-batch, which is also the only
        placement B=1 admits, so a unit-batch sweep measures
        within-batch keeper resolution, not cross-batch replacement."""
        if doc_id >= 1_000_000:
            return ((doc_id - 1_000_001) % n_batches + 1) % n_batches
        return doc_id % n_batches

    def drain(n_batches: int, compact_at: int | None = None) -> float:
        """With ``compact_at`` (r19 — VERDICT r18 item 6, the
        compaction payback row the neardup store's table already
        has): drain the first half, stop-compact the url_keepers
        store through compact_at-2 (the replay-safe horizon, the
        q203 cadence), then drain the rest through the SAME
        checkpoint — compaction wall INCLUDED in the reading."""
        from apache_hadoop_framework_for_peptide_identification_spark.streaming.windows import (
            compact_ingest_store,
        )

        root = tempfile.mkdtemp(prefix="stream_tp_crawl_")
        src, ckpt, store = (os.path.join(root, d) for d in ("src", "ckpt", "store"))
        os.makedirs(src)

        def _write(lo: int, hi: int) -> None:
            for i in range(lo, hi):
                # Zero-padded names + strictly increasing mtimes: the
                # file stream source orders by modification time with
                # a lexicographic tie-break, and a tight write loop
                # produces same-millisecond mtimes where "b10" sorts
                # before "b9" — which would silently reorder batches
                # and void the re-crawl-arrives-later guarantee at
                # larger B (r18 review finding).
                path = os.path.join(src, f"b{i:05d}.warc")
                with open(path, "w", encoding="utf-8", newline="") as fh:
                    fh.write("".join(
                        r["rec"] for r in all_rows
                        if _crawl_file_idx(r["doc_id"], n_batches) == i
                    ))
                t = 1_700_000_000 + i
                os.utime(path, (t, t))

        def _drain() -> None:
            C.stream_crawl_ingest(
                W.read_warc_stream(spark, src, max_files_per_trigger=1),
                store, ckpt, id_expr=id_expr, quality_expr=qual,
            )

        if compact_at is None:
            _write(0, n_batches)
            t0 = time.perf_counter()
            _drain()
            wall = time.perf_counter() - t0
        else:
            _write(0, compact_at)
            t0 = time.perf_counter()
            _drain()
            compact_ingest_store(
                spark, store, through_batch=compact_at - 2,
                substores=("url_keepers",),
            )
            wall = time.perf_counter() - t0
            _write(compact_at, n_batches)
            t0 = time.perf_counter()
            _drain()
            wall += time.perf_counter() - t0
        n_parts = len(
            [d for d in os.listdir(os.path.join(store, "url_keepers"))
             if d.startswith("batch_id=")]
        )
        expect = n_batches if compact_at is None else n_batches - compact_at + 2
        if n_parts != expect:
            print(f"WARNING: {n_parts} store partitions for {n_batches} files "
                  f"(expected {expect})", flush=True)
        shutil.rmtree(root, ignore_errors=True)
        return wall

    if args.compact_probe is not None:
        _run_compact_probe(
            drain, args.compact_probe, "crawl_compact_probe",
            n_rows, spark, label="crawl ",
        )
        return

    drain(batch_counts[0])  # session warm-up, untimed
    results: dict[int, float] = {}
    for b in batch_counts:
        wall = drain(b)
        results[b] = round(wall, 2)
        print(
            f"crawl_ingest B={b}: {wall:.2f} s total, "
            f"{n_rows / wall:.0f} recs/s, {wall / b:.2f} s/batch",
            flush=True,
        )
    spark.stop()
    print(f"\ncorpus: {n_rows} WARC records ({args.docs} pages + re-crawls), "
          f"sf_dir {SF_DIR}")
    print("\n| operator | batches | wall (s) | recs/s | s/batch |")
    print("|---|---|---|---|---|")
    for b, wall in results.items():
        print(f"| crawl_ingest | {b} | {wall:.2f} | {n_rows / wall:.0f} | "
              f"{wall / b:.2f} |")
    print(json.dumps({
        "metric": "stream_crawl_throughput", "sf_dir": SF_DIR, "docs": n_rows,
        "results": {str(b): w for b, w in results.items()},
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--batches", default="1,4,16,64")
    ap.add_argument("--compact-probe", type=int, default=None)
    ap.add_argument("--crawl", action="store_true",
                    help="measure stream_crawl_ingest (r17): WARC records "
                         "through the incremental URL-keeper store, one "
                         "source file per micro-batch; one re-crawl per 10 "
                         "docs forces genuine keeper replacements each batch")
    args = ap.parse_args()
    batch_counts = [int(b) for b in args.batches.split(",")]

    if args.crawl:
        _crawl_mode(args, batch_counts)
        return

    from pyspark.sql import functions as F

    from apache_hadoop_framework_for_peptide_identification_spark.session import get_spark
    from apache_hadoop_framework_for_peptide_identification_spark.streaming.windows import (
        stream_dedup_ladder,
        stream_neardup_ingest,
    )

    spark = get_spark("stream-throughput")
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < args.docs)
    )
    # one planted near-dup per 10 docs (drop last word, id offset 10^6)
    # so the incremental near-dup path does real work every batch
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace("text", " \\S+\\z", "").alias("text"),
    )
    # cached: drain()'s per-file writes would otherwise re-read the
    # parquet and recompute the planted dups once per source file —
    # B scans per run (code-review r15 finding); count() materializes
    corpus = docs.unionByName(dups).cache()
    n_rows = corpus.count()

    ops = {
        "neardup_ingest": stream_neardup_ingest,
        "dedup_ladder": stream_dedup_ladder,
    }

    def drain(op, n_batches: int, compact_at: int | None = None) -> float:
        """Write the corpus as n_batches files into fresh dirs and time
        the availableNow drain(s) with maxFilesPerTrigger=1. With
        ``compact_at``, drain the first half, compact the store through
        its max-1 (the replay-safe horizon), then drain the rest —
        compaction wall INCLUDED in the reading (a cadence you can't
        afford to run isn't a win)."""
        from apache_hadoop_framework_for_peptide_identification_spark.streaming.windows import (
            compact_ingest_store,
        )

        root = tempfile.mkdtemp(prefix="stream_tp_")
        src, ckpt, store = (os.path.join(root, d) for d in ("src", "ckpt", "store"))

        def _write(lo: int, hi: int) -> None:
            # deterministic round-robin split: batch i holds ids ≡ i (mod B)
            for i in range(lo, hi):
                corpus.filter(
                    F.col("doc_id") % n_batches == i
                ).repartition(1).write.mode("append").parquet(src)

        def _drain() -> None:
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            op(stream, store, ckpt, "doc_id", "text",
               threshold=0.5, num_hashes=64, bands=16, shingle_n=3)

        wall = 0.0
        if compact_at is None:
            _write(0, n_batches)
            t0 = time.perf_counter()
            _drain()
            wall = time.perf_counter() - t0
        else:
            _write(0, compact_at)
            t0 = time.perf_counter()
            _drain()
            compact_ingest_store(spark, store, through_batch=compact_at - 2)
            wall = time.perf_counter() - t0
            _write(compact_at, n_batches)
            t0 = time.perf_counter()
            _drain()
            wall += time.perf_counter() - t0
        n_parts = len(
            [d for d in os.listdir(os.path.join(store, "postings"))
             if d.startswith("batch_id=")]
        )
        expect = n_batches if compact_at is None else n_batches - compact_at + 2
        if n_parts != expect:
            print(
                f"WARNING: {n_parts} store partitions, expected {expect} "
                f"for {n_batches} source files — maxFilesPerTrigger not honored?",
                flush=True,
            )
        shutil.rmtree(root, ignore_errors=True)
        return wall

    if args.compact_probe is not None:
        op = ops["neardup_ingest"]
        _run_compact_probe(
            lambda b, **kw: drain(op, b, **kw),
            args.compact_probe, "stream_compact_probe", n_rows, spark,
        )
        return

    results: dict[str, dict[int, float]] = {}
    for name, op in ops.items():
        drain(op, batch_counts[0])  # session warm-up, untimed
        results[name] = {}
        for b in batch_counts:
            wall = drain(op, b)
            results[name][b] = round(wall, 2)
            print(
                f"{name} B={b}: {wall:.2f} s total, "
                f"{n_rows / wall:.0f} docs/s, {wall / b:.2f} s/batch",
                flush=True,
            )
    spark.stop()

    print(f"\ncorpus: {n_rows} docs ({args.docs} base + planted near-dups), sf_dir {SF_DIR}")
    print("\n| operator | batches | wall (s) | docs/s | s/batch |")
    print("|---|---|---|---|---|")
    for name in results:
        for b, wall in results[name].items():
            print(
                f"| {name} | {b} | {wall:.2f} | {n_rows / wall:.0f} | {wall / b:.2f} |"
            )
    # per-batch overhead: slope between the two largest B (fixed N, so
    # marginal batches are nearly empty of data — pure overhead + tax)
    for name in results:
        bs = sorted(results[name])
        if len(bs) >= 2:
            b1, b2 = bs[-2], bs[-1]
            slope = (results[name][b2] - results[name][b1]) / (b2 - b1)
            print(f"{name}: marginal cost {slope:.2f} s/batch over B={b1}->{b2}")
    print(json.dumps({
        "metric": "stream_throughput", "sf_dir": SF_DIR, "docs": n_rows,
        "results": {k: {str(b): w for b, w in v.items()} for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
