"""Partition-setting invariance: a distributed engine's results must
not depend on spark.sql.shuffle.partitions (or any physical layout
knob). Representative queries from every operator family run under two
very different settings; canonical value-hashes must agree — this is
the invariant that makes local[32] results transfer to a
1000-executor cluster."""

from __future__ import annotations

import pytest

from tests.oracle import value_hash

from apache_hadoop_framework_for_peptide_identification_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# One per family: agg, join+topk, window, set-ops, dedup, similarity,
# E-PIPE, salted, clusters.
REPRESENTATIVE = [
    "q01_scan_filter_agg",
    "q02_join_revenue_topk",
    "q03_window_topk_per_group",
    "q28_set_ops",
    "q40_dedup_exact",
    "q44_ann_cosine_topk",
    "q50_pipe_tokens",
    "q74_salted_agg",
    "q79_dedup_clusters",
    # round-3 families: corpus prep, global rank, packing, quantization,
    # merge — determinism under physical-layout change is the entire
    # point of q86/q88
    "q83_repetition_filter",
    "q86_stratified_sample",
    "q87_sequence_packing",
    "q88_epoch_shuffle",
    "q90_embedding_quantize",
    "q96_dedup_corpus",
    "q97_upsert_merge",
    # corpus-analytics family (q100+): first-occurrence dedup policy,
    # BM25 float scoring, and heavy-hitter ties must not move with the
    # physical layout
    "q100_paragraph_dedup",
    "q101_lm_familiarity",
    "q102_bm25_topk",
    "q103_top_ngrams",
    # iterative fixed-point family: 10 chained join+agg rounds must not
    # drift with layout (integer ranks make this exact, not just close)
    "q106_textrank_keywords",
    "q107_prefix_jaccard",
    # round-6 families: portable-SimHash block join, bloom-prefiltered
    # dedup (the distributed bitmap build must be layout-independent),
    # sketch merge (hll_union_agg associativity/commutativity across
    # layouts), custom Python data source (planned splits, not layout)
    "q120_simhash_verified_pairs",
    "q116_bloom_incremental_dedup",
    "q123_hll_sketch_union",
    "q129_python_datasource",
    # round-10 span family: the first-occurrence keeper rule (q177)
    # orders by (doc_id, pos) — a packed-key min aggregate whose result
    # must not move with layout — and q178's covered-position sets are
    # collected per doc across partitions before the map-side surgery
    "q177_exact_substring_dedup",
    "q178_decontaminate_spans",
    # round-11 families: the URL keeper window's (quality desc, id)
    # argmax must not move with layout (q179; q181's domain cap is the
    # same window on a derived key plus a broadcast anti-join), and the
    # sliding span form's corpus-order firsts + 9-window runs compose
    # three layout-sensitive-looking stages (sort-agg, island window,
    # removal join) that must all be invariant (q182)
    "q179_url_canonical_dedup",
    "q181_domain_blocklist_cap",
    "q182_sliding_substring_dedup",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_invariant_to_shuffle_partitions(spark, name):
    fn = REGISTRY[name].fn
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        h3 = value_hash(fn(spark, SF).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "31")
        h31 = value_hash(fn(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert h3 == h31, f"{name} result depends on shuffle partitioning"
