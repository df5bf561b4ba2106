"""Pipeline batch 82 (round 4): ZONE-MAP PRUNING AUDIT + COMPACTION
PLANNING — two physical-layout operators for the lakehouse tier.

* ``zone_map_pruning_audit`` — simulates parquet row-group zone maps:
  chunk the orders table into fixed-size zones in physical (order-key)
  order, record each zone's min/max order date, and measure how many
  zones a date-range predicate can skip. The companion measurement to
  ``zorder_locality_events`` / ``hilbert_locality_events``: those score
  layout quality by value locality, this one converts layout into the
  actual scan-pruning rate a reader achieves — THE number that decides
  whether a 100 TB table needs re-clustering.
* ``compaction_bin_packing`` — the small-file compaction planner: treat
  each event day as one landed file (size = row count), pack files into
  target-size output bins by cumulative size in time order, and report
  each bin's fill. At scale this is the nightly OPTIMIZE job's plan;
  cumulative-sum bucketing keeps the plan deterministic and
  oracle-checkable (vs. greedy first-fit-decreasing, which needs a
  sequential scan — documented trade-off).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
storage-layout tier; both queries extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_ZONE_ROWS = 500  # rows per simulated row-group
_PRED_LO = "1996-01-01"
_PRED_HI = "1997-01-01"


@register(
    "zone_map_pruning_audit",
    oracle=f"""
        WITH z AS (
            SELECT (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // {_ZONE_ROWS} AS zone_id,
                   o_orderdate
            FROM orders
        ),
        zm AS (
            SELECT zone_id,
                   COUNT(*) AS n_rows,
                   MIN(o_orderdate) AS min_date,
                   MAX(o_orderdate) AS max_date
            FROM z GROUP BY zone_id
        )
        SELECT CAST(zone_id AS BIGINT) AS zone_id,
               CAST(n_rows AS BIGINT) AS n_rows,
               min_date, max_date,
               (max_date < TIMESTAMP '{_PRED_LO}' OR min_date >= TIMESTAMP '{_PRED_HI}') AS pruned
        FROM zm
    """,
    tags=("storage", "zone-map", "pruning", "orders", "layout"),
)
def zone_map_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (row-group min/max) pruning audit: orders are chunked
    into 500-row zones in order-key order (the physical write order
    proxy), each zone keeps its order-date min/max — exactly what a
    parquet footer stores — and a reader's 1996 date-range predicate
    marks each zone prunable or not. Un-clustered dates give ~0%
    pruning; a date-sorted rewrite gives ~85% — the measurement that
    justifies re-clustering a 100 TB table.

    Scale design: the zone assignment is a row_number over the physical
    sort key — on a real table this is free (zones ARE row groups, read
    from footer metadata); here one range-partitioned sort materializes
    them. Everything after the zone rollup is zone-count-sized."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    z = orders.select(
        F.floor((F.row_number().over(w) - 1) / _ZONE_ROWS)
        .cast("bigint")
        .alias("zone_id"),
        "o_orderdate",
    )
    zm = z.groupBy("zone_id").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )
    lo = F.lit(_PRED_LO).cast("timestamp")
    hi = F.lit(_PRED_HI).cast("timestamp")
    return zm.select(
        "zone_id",
        "n_rows",
        "min_date",
        "max_date",
        ((F.col("max_date") < lo) | (F.col("min_date") >= hi)).alias("pruned"),
    )


_TARGET_ROWS = 2000  # target output-file size for compaction (in rows)


@register(
    "compaction_bin_packing",
    oracle=f"""
        WITH files AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_rows
            FROM events GROUP BY 1
        ),
        packed AS (
            SELECT day, n_rows,
                   (CAST(SUM(n_rows) OVER (ORDER BY day) AS BIGINT) - n_rows)
                       // {_TARGET_ROWS} AS bin_id
            FROM files
        )
        SELECT CAST(bin_id AS BIGINT) AS bin_id,
               COUNT(*) AS n_files,
               CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
               {duck_int_ratio("CAST(SUM(n_rows) AS BIGINT)", str(_TARGET_ROWS), 6)} AS fill_e6
        FROM packed
        GROUP BY bin_id
    """,
    tags=("storage", "compaction", "bin-packing", "events", "layout"),
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction planning for the small-files problem: each event day is
    one landed file (size = its row count); files pack into target-size
    (2000-row) output bins by CUMULATIVE size in time order — a file
    opens a new bin when the bytes before it already fill the current
    one. Output is the compaction manifest: per bin its file count, total
    rows, and fill ratio. Deterministic cumulative bucketing (unlike
    greedy FFD, which is inherently sequential) is what makes the plan
    reproducible and cheap to compute distributed.

    Scale design: one groupBy(day) over the fact scan; the packing
    window runs over the day-level rollup (hundreds of rows), so the
    SinglePartition stage is negligible — at 100 TB the 'files' relation
    is the metadata listing, thousands of rows, never the data."""
    ev = load_table(spark, sf_dir, "events")
    files = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_rows")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    packed = files.select(
        "day",
        "n_rows",
        F.call_function(
            "div",
            (F.sum("n_rows").over(w) - F.col("n_rows")).cast("bigint"),
            F.lit(_TARGET_ROWS).cast("bigint"),
        ).alias("bin_id"),
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_files"),
        F.sum("n_rows").cast("bigint").alias("bin_rows"),
        int_ratio(F.sum("n_rows"), F.lit(_TARGET_ROWS), 6).alias("fill_e6"),
    )
