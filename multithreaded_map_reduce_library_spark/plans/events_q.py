"""Event-time window operators beyond the tumbling/sessionize pair in
plans/relational.py: sliding windows and Spark's native session_window —
batch twins of the Structured Streaming forms (identical semantics; the
streaming variants in streaming/windows.py share the grouping logic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "events_sliding_1h_15m",
    oracle="""
        WITH w AS (
            SELECT time_bucket(INTERVAL '15 minutes', ts) - (i * INTERVAL '15 minutes')
                       AS window_start,
                   event_type, value
            FROM events, unnest([0, 1, 2, 3]) AS t(i)
        )
        SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
               COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
        FROM w
        GROUP BY 1, 2
    """,
    tags=("events", "sliding-window", "streaming-equivalent"),
)
def events_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 15 min slide): each event lands in 4
    overlapping windows. Spark expands map-side (one Expand node, x4 rows)
    then aggregates — one shuffle, same as tumbling; the oracle spells the
    expansion as unnest over the 4 window offsets."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_session_windows",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                        WHEN ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1
                        ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, new_sess DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
              FROM g)
        SELECT user_id,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM s
        GROUP BY user_id, sess_id
    """,
    tags=("events", "session-window", "streaming-equivalent"),
    bench=True,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30 min gap): per-session start/end/
    aggregates. Session end = last event + gap (Spark's definition); the
    oracle reproduces the gap-merge with a lag + cumulative-sum rewrite.
    Note session_window merges events with gap < 30 min (a gap of exactly
    30 min starts a new session — hence `>=` in the oracle's new_sess)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
