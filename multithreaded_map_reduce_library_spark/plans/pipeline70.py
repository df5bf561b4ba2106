"""Pipeline batch 70: interval-overlap join — session co-presence.

The one join shape the registry lacked: INTERVAL x INTERVAL overlap
(as-of and point-range joins exist since round 1). Implemented with the
standard scale technique — explode each interval to the hour buckets it
spans, equi-join on bucket (co-partitioned, never all-pairs), verify
real overlap, DISTINCT away multi-bucket duplicates — while the DuckDB
oracle runs the UNPRUNED all-pairs interval join, so the driver's hash
check PROVES the bucketing lossless (the pipeline28
prefix-filter/bloom-join discipline applied to time intervals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "session_overlap_pairs",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS sid
            FROM g
        ),
        sess AS (
            SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
            FROM s GROUP BY user_id, sid
        ),
        -- UNPRUNED all-pairs interval join: the oracle deliberately skips
        -- the bucketing so a hash match proves the pruned plan lossless
        pairs AS (
            SELECT GREATEST(a.t0, b.t0) AS ostart,
                   epoch_us(LEAST(a.t1, b.t1)) - epoch_us(GREATEST(a.t0, b.t0))
                       AS o_us
            FROM sess a JOIN sess b
              ON a.user_id < b.user_id AND a.t0 <= b.t1 AND b.t0 <= a.t1
        )
        SELECT CAST(ostart AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(o_us) AS BIGINT) AS total_overlap_us
        FROM pairs GROUP BY 1
    """,
    tags=("events", "interval-join", "sessionize", "co-presence"),
)
def session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session co-presence: sessionize every user's events (30-min gap),
    then find all cross-user session pairs whose [start, end] intervals
    overlap (inclusive), reporting per day (of overlap start) the pair
    count and total overlapped microseconds — the concurrency/abuse
    signal ("how much same-time activity is there, and between whom").

    Scale design — bucketed interval join: each session explodes to the
    HOUR buckets it spans (bounded by session length, not corpus), the
    pair search equi-joins on bucket so only time-adjacent sessions ever
    meet (never all-pairs: ~n/720 sessions per bucket here), real
    overlap is verified on the interval bounds, and a DISTINCT on the
    session-pair key removes multi-bucket duplicates before the daily
    rollup. The ORACLE runs the unpruned all-pairs interval join, so
    the value hash proves the bucketing drops nothing. Overlap
    durations are exact integer microseconds (epoch_us both engines) —
    no float anywhere."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL '30' MINUTE")), 1
    ).otherwise(0)
    sid = F.sum(new_sess).over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        e.select("user_id", "ts", sid.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    bucketed = sess.select(
        "user_id",
        "sid",
        "t0",
        "t1",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "t0"),
                F.date_trunc("hour", "t1"),
                F.expr("INTERVAL '1' HOUR"),
            )
        ).alias("bucket"),
    )
    a = bucketed.select(
        F.col("user_id").alias("ua"), F.col("sid").alias("sa"),
        F.col("t0").alias("a0"), F.col("t1").alias("a1"), "bucket",
    )
    b = bucketed.select(
        F.col("user_id").alias("ub"), F.col("sid").alias("sb"),
        F.col("t0").alias("b0"), F.col("t1").alias("b1"), "bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .filter(
            (F.col("ua") < F.col("ub"))
            & (F.col("a0") <= F.col("b1"))
            & (F.col("b0") <= F.col("a1"))
        )
        .select("ua", "sa", "ub", "sb", "a0", "a1", "b0", "b1")
        .distinct()  # a pair can co-occupy several hour buckets
    )
    o_start = F.greatest("a0", "b0")
    o_us = F.unix_micros(
        F.least("a1", "b1").cast("timestamp")
    ) - F.unix_micros(o_start.cast("timestamp"))
    return (
        pairs.select(o_start.cast("date").alias("day"), o_us.alias("o_us"))
        .groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("o_us").cast("bigint").alias("total_overlap_us"),
        )
    )
