"""Event-time window operators beyond the tumbling/sessionize pair in
plans/relational.py: sliding windows and Spark's native session_window —
batch twins of the Structured Streaming forms (identical semantics; the
streaming variants in streaming/windows.py share the grouping logic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import grid, gsum
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
               COUNT(*) AS n_events, CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e2
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
        .agg(F.count("*").alias("n_events"), gsum(F.col("value"), 2).alias("sum_value_e2"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_e2",
        )
    )


@register(
    "funnel_click_to_purchase",
    oracle="""
        WITH j AS (
            SELECT p.event_id, p.user_id, p.ts AS p_ts, c.ts AS c_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND c.ts <= p.ts
        )
        SELECT user_id,
               COUNT(*) AS n_purchases,
               CAST(COUNT(*) FILTER (WHERE c_ts IS NOT NULL
                    AND p_ts - c_ts <= INTERVAL 1 HOUR) AS BIGINT) AS n_converted
        FROM j GROUP BY user_id
    """,
    tags=("events", "funnel", "asof"),
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: purchases preceded by a click within 1 h, per
    user — composed from the as-of join's union-sort plan (one shuffle on
    user_id, no range join) plus a conditional aggregate."""
    from multithreaded_map_reduce_library_spark.plans.relational2 import (
        asof_purchase_last_click,
    )

    j = asof_purchase_last_click(spark, sf_dir)
    converted = F.when(
        F.col("last_click_ts").isNotNull()
        & (F.col("purchase_ts") - F.col("last_click_ts") <= F.expr("INTERVAL '1' HOUR")),
        1,
    ).otherwise(0)
    return j.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.sum(converted).alias("n_converted"),
    )


@register(
    "cohort_weekly_retention",
    oracle="""
        WITH firsts AS (SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
                        FROM events GROUP BY user_id),
        activity AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
                     FROM events)
        SELECT CAST(d0 AS TIMESTAMP) AS cohort_day,
               CAST(datediff('day', d0, d) // 7 AS INTEGER) AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM activity a JOIN firsts USING (user_id)
        GROUP BY 1, 2
    """,
    tags=("events", "cohort", "retention"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted per
    week-offset of later activity. Two aggregations sharing the user_id
    partitioning plus one skinny join."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    firsts = e.groupBy("user_id").agg(F.min(day).alias("d0"))
    activity = e.select("user_id", day.alias("d")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.col("d0").cast("timestamp_ntz").alias("cohort_day"),
            F.floor(F.datediff("d", "d0") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "histogram_order_prices",
    oracle="""
        SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 500000 THEN 21
                         ELSE CAST(floor(o_totalprice / 25000) AS INTEGER) + 1
                    END AS INTEGER) AS bucket,
               COUNT(*) AS n_orders,
               CAST(FLOOR(MIN(o_totalprice) * 10000.0 + 0.5) AS BIGINT) AS lo_e4,
               CAST(FLOOR(MAX(o_totalprice) * 10000.0 + 0.5) AS BIGINT) AS hi_e4
        FROM orders
        GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram via width_bucket — the equi-width binning every
    profiling pass runs; one partial-aggregable shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(20))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            grid(F.min("o_totalprice"), 4).alias("lo_e4"),
            grid(F.max("o_totalprice"), 4).alias("hi_e4"),
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
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e2
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
        .agg(F.count("*").alias("n_events"), gsum(F.col("value"), 2).alias("sum_value_e2"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "sum_value_e2",
        )
    )
