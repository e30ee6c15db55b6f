"""Streaming queries (driver-checkable): each drives a Structured
Streaming plan to completion over the replayed events stream and
returns the result as a batch frame, so the DuckDB oracle can verify
streaming semantics == batch semantics on the same data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.windows import events_stream, run_to_memory, stream_dedup, tumbling_agg
from . import query


@query(
    "q51_stream_tumbling",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, user_id,
       count(*) AS n_events, sum(value) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q51_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window over the file stream, complete output mode
    → must equal the batch group-by (q04) exactly."""
    ev = events_stream(spark, sf_dir)
    agg = tumbling_agg(ev, "1 hour")
    return run_to_memory(agg, output_mode="complete").orderBy("window_start", "user_id")


@query(
    "q52_stream_dedup",
    oracle="""
SELECT user_id, CAST(count(DISTINCT event_id) AS BIGINT) AS n
FROM events GROUP BY user_id ORDER BY user_id
""",
)
def q52_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream dedup on event_id (append mode), then a batch
    rollup of the deduped stream."""
    ev = events_stream(spark, sf_dir)
    deduped = stream_dedup(ev, ["event_id"])
    out = run_to_memory(deduped, output_mode="append")
    return out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).orderBy("user_id")


@query(
    "q53_session_window",
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def q53_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) — F.session_window in batch
    mode; the oracle reconstructs sessions with the lag/gap/cumsum
    idiom. Streaming session_window is exercised in tests (append mode
    emits only watermark-finalized sessions, which is data-dependent)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
