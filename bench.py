#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method mirrors BASELINE.md: 1 warm-up run per query, then best of
N_RUNS (default 3) measured as full collect() latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_hadoop_framework_for_peptide_identification_spark.queries import BENCH_REGISTRY, REGISTRY
from apache_hadoop_framework_for_peptide_identification_spark.session import get_spark

# B1-B4 (BASELINE.md) + the LLM-pipeline + E-PIPE + corpus headliners.
# Every entry has a matching stock-Spark row in scripts/measure_baseline.py
# so BENCH_r{N} / BASELINE.md ratios stay 1:1.
HEADLINE = [
    "q01_scan_filter_agg",
    "q02_join_revenue_topk",
    "q03_window_topk_per_group",
    "q04_tumbling_hourly",
    "q40_dedup_exact",
    "q42_dedup_minhash_lsh",
    "q44_ann_cosine_topk",
    "q50_pipe_tokens",
    "q67_embedding_neardup_lsh",
    "q83_repetition_filter",
    "q87_sequence_packing",
    "q100_paragraph_dedup",
    "q101_lm_familiarity",
    "q102_bm25_topk",
    "q103_top_ngrams",
    "q104_profile_table",
    "q105_length_histogram",
    "q106_textrank_keywords",
    "q107_prefix_jaccard",
    "q121_prefix_jaccard_corpus",
    "q133_triangle_count",
    "q135_rolling_active_users",
    "q137_frequent_pairs",
    "q149_pipe_corpus_scale",
    "q140_fuzzy_name_join",
    "q147_containment_pairs",
    "q164_shared_span_pairs",
    "q177_exact_substring_dedup",
    "q182_sliding_substring_dedup",
    "q165_containment_prefix_corpus",
    "q166_fuzzy_title_corpus",
    "q168_skew_adversarial_join",
    "q173_hot_key_two_path_join",
]

N_RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = (REGISTRY.get(name) or BENCH_REGISTRY[name]).fn
        fn(spark, sf_dir).collect()  # warm-up (JIT, file listing, broadcast)
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
