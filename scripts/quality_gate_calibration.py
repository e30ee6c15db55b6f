#!/usr/bin/env python
"""Quality-gate threshold calibration on the real corpus (r18 —
VERDICT r17 item 7: the q202 registry row proves the gate's
integer-exact machinery on PLANTED classes at threshold=0; a
production user tuning the gate on a real crawl needs the measured
MARGIN DISTRIBUTIONS — the treatment the LSH knobs
(lsh_knobs_volume) and the ANN recall curves already got).

Protocol: train the q202-shape binary model (clean fixture docs as
'keep', the subscribe/cookie/rights boilerplate string as 'drop' —
TRAIN_N docs per class, disjoint from scoring) and score every
remaining document THREE ways — as-is ('clean'), boilerplate
prepended to a 40-char stub ('boiler', the q202 injection), and
boilerplate prepended to a PER-DOC-VARYING amount of clean text
('mixed', r19 — VERDICT r18 item 7: the clean/boiler clouds are
fully separated on this fixture, so without an overlapping class the
confusion table never shows a real trade; the mixed class's
keep-signal grows with doc_id while its drop-signal stays fixed, so
its margins SPAN zero and every threshold choice visibly trades
mixed-kept against mixed-dropped — the operating-point decision a
production user actually faces with partially-boilerplated pages).
Report per-class margin percentiles and the keep/drop confusion at
candidate thresholds: the fail-open/fail-closed extremes (-1, 0)
plus the empirical midpoint between the clean/boiler class medians.
What a user reads off the table: where the three margin clouds sit,
how wide the overlap is, and what keep-rate each threshold buys on
each class.

The margins are exact BIGINTs (q198/q202 contract), so the table is
machine-reproducible bit-for-bit on any engine with the same fixture.

Usage: python scripts/quality_gate_calibration.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from apache_hadoop_framework_for_peptide_identification_spark.catalog import load_table  # noqa: E402
from apache_hadoop_framework_for_peptide_identification_spark.operators import text as T  # noqa: E402
from apache_hadoop_framework_for_peptide_identification_spark.session import get_spark  # noqa: E402

BOILER = (
    "click here to subscribe now accept all cookies terms of "
    "service privacy policy all rights reserved "
)
TRAIN_N = 30
N, BUCKETS = 3, 4096


def _pcts(series):
    qs = series.quantile([0.01, 0.25, 0.50, 0.75, 0.99])
    return [int(qs.loc[p]) for p in (0.01, 0.25, 0.50, 0.75, 0.99)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("quality-gate-calibration")
    t0 = time.time()
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = d.count()

    tb = d.filter(F.col("doc_id") < TRAIN_N)
    train = tb.select(F.lit("keep").alias("lang"), "text").unionByName(
        tb.select(
            F.lit("drop").alias("lang"),
            F.concat(F.lit(BOILER), F.col("doc_id").cast("string")).alias("text"),
        )
    )
    model = T.train_char_ngram_lid(train, "text", "lang", n=N, buckets=BUCKETS)

    held = d.filter(F.col("doc_id") >= TRAIN_N)
    clean = T.quality_gate(held, "doc_id", "text", model, n=N, buckets=BUCKETS)
    boiler = T.quality_gate(
        held.select(
            "doc_id",
            F.concat(F.lit(BOILER), F.substring("text", 1, 40)).alias("text"),
        ),
        "doc_id", "text", model, n=N, buckets=BUCKETS,
    )
    # mixed: fixed drop-signal (one BOILER), keep-signal varying
    # per doc — clean prefix from ~0 to ~15× the boilerplate's length,
    # so the class's margins span zero and overlap BOTH pure clouds
    mixed = T.quality_gate(
        held.select(
            "doc_id",
            F.concat(
                F.lit(BOILER),
                F.substring("text", 1, (F.col("doc_id") % 16).cast("int") * 90),
            ).alias("text"),
        ),
        "doc_id", "text", model, n=N, buckets=BUCKETS,
    )
    cm = clean.select("margin").toPandas()["margin"]
    bm = boiler.select("margin").toPandas()["margin"]
    mm = mixed.select("margin").toPandas()["margin"]

    print(f"\ncorpus: {n_docs} docs ({sf_dir}), {len(cm)} held-out per class, "
          f"train {TRAIN_N}/class, n={N}, buckets={BUCKETS}")
    print("\n| class | n | p1 | p25 | median | p75 | p99 | frac > 0 |")
    print("|---|---|---|---|---|---|---|---|")
    rows = {}
    for label, m in (("clean", cm), ("boiler-injected", bm),
                     ("mixed-contaminated", mm)):
        p = _pcts(m)
        frac = float((m > 0).mean())
        rows[label] = {"pcts": p, "frac_pos": round(frac, 4)}
        print(f"| {label} | {len(m)} | {p[0]} | {p[1]} | {p[2]} | {p[3]} | "
              f"{p[4]} | {frac:.3f} |")

    mid = int((cm.median() + bm.median()) // 2)
    print("\n| threshold | clean kept | boiler kept (leak) | mixed kept | note |")
    print("|---|---|---|---|---|")
    sweep = {}
    for thr, note in ((-1, "fail-open"), (0, "default fail-closed"),
                      (mid, "class-median midpoint")):
        ck = float((cm > thr).mean())
        bk = float((bm > thr).mean())
        mk = float((mm > thr).mean())
        sweep[str(thr)] = {"clean_kept": round(ck, 4),
                           "boiler_kept": round(bk, 4),
                           "mixed_kept": round(mk, 4)}
        print(f"| {thr} | {ck:.3f} | {bk:.3f} | {mk:.3f} | {note} |")

    print(json.dumps({
        "metric": "quality_gate_calibration", "sf_dir": sf_dir,
        "held_out_per_class": int(len(cm)), "train_per_class": TRAIN_N,
        "margins": rows, "midpoint_threshold": mid, "thresholds": sweep,
        "wall_s": round(time.time() - t0, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
