"""Pipeline batch 110 (round 4): ROLLUP-LATTICE ADVISOR + WATERMARK
LATENESS AUDIT — a materialized-view sizing pass and the event-time
disorder measurement that watermark choices should come from:

* ``rollup_lattice_cardinalities`` — exact cardinality of every
  grouping in the {status, priority, year} cube lattice in ONE pass
  (GROUPING SETS + grouping_id), with each grouping's row count and
  reduction ratio vs the base relation — the estimator behind "which
  rollups are worth materializing" (a cube cell that barely shrinks
  its parent isn't worth storage).
* ``watermark_lateness_audit`` — out-of-orderness of the events table
  under arrival order (event_id): lateness = running-max(ts) − ts in
  exact seconds, summarized as on-time/late counts, p50/p95/p99 (ceil
  ranks on the exact distinct-lateness walk) and max — the numbers a
  Structured Streaming deployment reads before choosing
  ``withWatermark`` (p99 lateness ≈ the state-retention cost of not
  dropping data).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no OLAP or streaming tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "rollup_lattice_cardinalities",
    oracle="""
        WITH base AS (
            SELECT o_orderstatus AS status, o_orderpriority AS priority,
                   CAST(year(o_orderdate) AS BIGINT) AS yr
            FROM orders
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_base FROM base),
        cells AS (
            SELECT COALESCE(status, '*') AS status,
                   COALESCE(priority, '*') AS priority,
                   COALESCE(CAST(yr AS VARCHAR), '*') AS yr,
                   CAST(GROUPING(status) * 4 + GROUPING(priority) * 2
                        + GROUPING(yr) AS BIGINT) AS gid,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM base
            GROUP BY GROUPING SETS (
                (status, priority, yr), (status, priority), (status, yr),
                (priority, yr), (status), (priority), (yr), ()
            )
        )
        SELECT gid, CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(n_rows) AS BIGINT) AS n_rows_covered,
               CAST((COUNT(*) * 1000000 + n_base // 2) // n_base AS BIGINT)
                   AS compression_e6
        FROM cells CROSS JOIN tot
        GROUP BY gid, n_base
        ORDER BY gid
    """,
    tags=("olap", "cube", "grouping-sets", "advisor", "orders"),
)
def rollup_lattice_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cardinality of all 8 groupings of the
    {status, priority, year} cube in one GROUPING SETS pass: per
    grouping (gid = GROUPING bits) the number of distinct cells, the
    rows covered (= base rows, the conservation check), and the
    cells-per-base-row compression ratio on the e6 grid — the
    materialized-view advisor's sizing table (a gid whose
    compression_e6 is near 1e6 shrinks nothing and isn't worth
    storing).

    Scale design: GROUPING SETS is one scan with map-side partial
    aggregation into all 8 groupings at once (Spark Expand + partial
    agg) — vs 8 separate scans; output is Σ|cells| rows, bounded by
    the dimension domains, never by the fact table."""
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
    )
    tot = base.agg(F.count("*").cast("bigint").alias("n_base"))
    cells = (
        base.cube("status", "priority", "yr")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (
                F.grouping("status") * 4 + F.grouping("priority") * 2 + F.grouping("yr")
            )
            .cast("bigint")
            .alias("gid"),
        )
        .select(
            F.coalesce(F.col("status"), F.lit("*")).alias("status"),
            F.coalesce(F.col("priority"), F.lit("*")).alias("priority"),
            F.coalesce(F.col("yr").cast("string"), F.lit("*")).alias("yr"),
            "gid",
            "n_rows",
        )
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("gid", "n_base")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum("n_rows").cast("bigint").alias("n_rows_covered"),
        )
        .select(
            "gid",
            "n_cells",
            "n_rows_covered",
            F.call_function(
                "div",
                F.col("n_cells") * 1000000
                + F.call_function("div", F.col("n_base"), F.lit(2).cast("bigint")),
                F.col("n_base"),
            )
            .cast("bigint")
            .alias("compression_e6"),
        )
        .orderBy("gid")
    )


@register(
    "watermark_lateness_audit",
    oracle="""
        WITH sec AS (
            -- truncated integer seconds (Spark's unix_timestamp semantics;
            -- DuckDB epoch() is a DOUBLE with microseconds, and // on
            -- DOUBLE is plain division, so floor+cast FIRST)
            SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, user_id, event_id
            FROM events
        ),
        arr AS (
            SELECT CAST(MAX(es) OVER (
                       ORDER BY es // 300, user_id, event_id
                       ROWS UNBOUNDED PRECEDING) - es AS BIGINT) AS late_s
            FROM sec
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_late,
                   CAST(MAX(late_s) AS BIGINT) AS max_s
            FROM arr
        ),
        cum AS (
            SELECT late_s, SUM(COUNT(*)) OVER (ORDER BY late_s) AS c
            FROM arr GROUP BY late_s
        ),
        pct AS (
            SELECT q, MIN(late_s) AS v
            FROM (VALUES (50), (95), (99)) AS tq(q)
            CROSS JOIN tot
            JOIN cum ON cum.c >= (q * tot.n_events + 99) // 100
            GROUP BY q
        )
        SELECT tot.n_events, tot.n_late,
               CAST(MAX(CASE WHEN q = 50 THEN v END) AS BIGINT) AS p50_s,
               CAST(MAX(CASE WHEN q = 95 THEN v END) AS BIGINT) AS p95_s,
               CAST(MAX(CASE WHEN q = 99 THEN v END) AS BIGINT) AS p99_s,
               tot.max_s
        FROM pct CROSS JOIN tot
        GROUP BY tot.n_events, tot.n_late, tot.max_s
    """,
    tags=("streaming", "watermark", "disorder", "events", "global-sort"),
)
def watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder under a realistic arrival order: events
    arrive in per-user upload batches within 5-minute windows
    (total order: (epoch DIV 300, user_id, event_id) — a later user's
    earlier event lands after an earlier user's later event, the shape
    mobile/IoT ingestion actually produces). Lateness = running-max
    event-time minus event-time in exact seconds; summarized as
    on-time/late counts and exact ceil-rank p50/p95/p99 + max. p99_s
    is the watermark a Structured Streaming job sets to retain 99% of
    late data — measured, not guessed.

    Scale design: the running max is one window over the arrival total
    order — at 100 TB this runs per ingest shard (arrival order is only
    total within a shard) and the percentile walk happens on the
    |distinct lateness| rollup, which hour/second bucketing bounds."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").cast("bigint").alias("es")
    )
    warr = Window.orderBy(
        F.expr("es DIV 300"), "user_id", "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    arr = ev.select(
        (F.max("es").over(warr) - F.col("es")).cast("bigint").alias("late_s")
    )
    tot = arr.agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0)).cast("bigint").alias("n_late"),
        F.max("late_s").cast("bigint").alias("max_s"),
    )
    cum = (
        arr.groupBy("late_s")
        .agg(F.count("*").alias("c0"))
        .select(
            "late_s",
            F.sum("c0")
            .over(Window.orderBy("late_s").rowsBetween(Window.unboundedPreceding, 0))
            .alias("c"),
        )
    )
    targets = (
        spark.createDataFrame([(q,) for q in (50, 95, 99)], "q int")
        .crossJoin(F.broadcast(tot.select("n_events")))
        .select("q", F.expr("CAST((q * n_events + 99) DIV 100 AS BIGINT)").alias("t"))
    )
    pct = (
        F.broadcast(targets)
        .join(cum, F.col("c") >= F.col("t"))
        .groupBy("q")
        .agg(F.min("late_s").alias("v"))
    )
    return (
        pct.crossJoin(F.broadcast(tot))
        .groupBy("n_events", "n_late", "max_s")
        .agg(
            F.max(F.when(F.col("q") == 50, F.col("v"))).cast("bigint").alias("p50_s"),
            F.max(F.when(F.col("q") == 95, F.col("v"))).cast("bigint").alias("p95_s"),
            F.max(F.when(F.col("q") == 99, F.col("v"))).cast("bigint").alias("p99_s"),
        )
        .select("n_events", "n_late", "p50_s", "p95_s", "p99_s", "max_s")
    )
