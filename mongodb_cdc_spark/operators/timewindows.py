"""Event-time window operators, batch-testable form (SURVEY.md §2B
"Streaming-only operators", the DuckDB-checkable subset).

The same ``window()`` / ``session_window()`` expressions run unchanged
under Structured Streaming (streaming/pipeline.py); registering them as
batch queries lets the DuckDB oracle verify bucket/session semantics
exactly, which a streaming harness can't. Window starts are emitted as
epoch BIGINTs (timestamp-output discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import sum2, sum2_sql
from mongodb_cdc_spark.registry import query


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT ((epoch_ns(ts) // 1000000000) // 3600) * 3600 AS window_start_epoch,
           event_type,
           COUNT(*) AS n,
           {sum2_sql('value', 'sum_value')[1]}
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling counts/sums per event type. Epoch-hour bucketing in
    the oracle ≡ ``window(ts, '1 hour')`` starts (both floor to the hour).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), sum2("value", "sum_value"))
        .select(
            F.to_unix_timestamp("w.start").cast("bigint").alias("window_start_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle=f"""
    WITH buckets AS (
      SELECT ((epoch_ns(ts) // 1000000000) // 1800) * 1800 AS s, value FROM events
      UNION ALL
      SELECT ((epoch_ns(ts) // 1000000000) // 1800) * 1800 - 1800 AS s, value FROM events
    )
    SELECT s AS window_start_epoch,
           COUNT(*) AS n,
           {sum2_sql('value', 'sum_value')[1]}
    FROM buckets
    GROUP BY s
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in
    exactly two windows (starts at floor30(ts) and floor30(ts)-30min —
    which is what the oracle's two-bucket unnest enumerates)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), sum2("value", "sum_value"))
        .select(
            F.to_unix_timestamp("w.start").cast("bigint").alias("window_start_epoch"),
            "n",
            "sum_value",
        )
    )


@query(
    "stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), islands AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM marked
    )
    SELECT user_id,
           (epoch_ns(MIN(ts)) // 1000000000) AS session_start_epoch,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, session_no
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user via ``session_window``. Spark opens
    a new session when the gap is >= the timeout, which is exactly the
    oracle's gaps-and-islands condition; session start = min(ts) of the
    island."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.to_unix_timestamp("w.start").cast("bigint").alias("session_start_epoch"),
            "n_events",
        )
    )
