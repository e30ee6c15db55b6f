"""Oracle-verified query registry — the driver contract.

Every operator claimed in SURVEY.md §2B registers here as a named query:
a PySpark builder ``fn(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string the
driver runs side-by-side at sf0.01. Computed columns are aliased to the
SAME name on both sides — the comparator sorts columns by name before
hashing values.

Registration is import-driven: importing this package pulls in every
query module, so ``__spark_entry__.queries()`` is just ``spark_fns()``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register a query builder under ``name`` with an optional oracle."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def spark_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sqls() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


# Import-for-side-effect: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import window  # noqa: E402,F401
from . import scalar_funcs  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import epipe  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import udf_surface  # noqa: E402,F401
from . import sources_q  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-visible ordering.
#
# The round-1 driver recorded CORRECTNESS verdicts for exactly the first 50
# registry entries in registration order, leaving the streaming / UDF /
# E-PIPE / sink / LLM-tail groups with no driver verdict (VERDICT.md round 1,
# "What's missing" #1).  Registration order is the lever we control, so we
# reorder the registry explicitly: every §2B group that lacked a round-1
# driver entry comes first, followed by re-verification slots for operators
# whose implementation changed this round, then one representative per
# already-green family.  The tail (previously driver-green, unchanged) keeps
# its original relative order.
_DRIVER_PRIORITY = [
    # E-PIPE (reference surface R1-R10; q77 implementation changed r2)
    "q50_pipe_tokens",
    "q77_pipe_lines",
    # Structured Streaming (ST1-ST8)
    "q51_stream_tumbling",
    "q52_stream_dedup",
    "q53_session_window",
    "q55_stream_sliding",
    "q56_stream_static_join",
    "q57_foreach_batch_sink",
    "q58_stateful_running_totals",
    # UDF surface (U1-U6)
    "q60_scalar_udf",
    "q61_pandas_udf_charge",
    "q62_grouped_map_zscore",
    "q63_grouped_agg_udaf",
    "q64_map_in_pandas",
    "q65_python_udtf",
    "q78_windowed_udaf",
    # Sources / sinks (S2, S3, S5; text scan)
    "q70_parquet_partitioned_sink",
    "q71_csv_roundtrip",
    "q72_json_roundtrip",
    "q73_text_scan",
    # Multimodal (L5)
    "q69_multimodal_decode",
    "q54_multimodal_bytes",
    # Text analysis tail (L4)
    "q47_quality_score",
    "q48_token_count",
    "q49_fingerprint",
    # Embedding near-dup / ANN tail (L3), clusters (L2), embed pipe (L6)
    "q66_embedding_neardup",
    "q67_embedding_neardup_lsh",
    "q68_ann_ivf",
    "q79_dedup_clusters",
    "q81_embed_text",
    # New this round: right outer join (J2 completion)
    "q82_join_right_outer",
    # Bench headliners (B1-B4) — keep driver verdicts fresh every round
    "q01_scan_filter_agg",
    "q02_join_revenue_topk",
    "q03_window_topk_per_group",
    "q04_tumbling_hourly",
    # Implementation changed this round — must re-verify under the driver
    "q14_asof_join",
    "q40_dedup_exact",
    "q43_dedup_simhash",
    "q45_ann_lsh",
    "q75_salted_join",
    # One representative per already-green family
    "q42_dedup_minhash_lsh",
    "q44_ann_cosine_topk",
    "q46_lang_id",
    "q74_salted_agg",
    "q05_project_expressions",
    "q08_join_left_outer",
    "q13_range_join",
    "q17_rollup",
    "q22_window_ranking",
    "q35_array_funcs",
]


def _reorder_registry() -> None:
    ordered: dict[str, QueryDef] = {}
    for name in _DRIVER_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, qdef in REGISTRY.items():
        if name not in ordered:
            ordered[name] = qdef
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
