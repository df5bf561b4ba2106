"""Operator-family batch 6: blocked fuzzy matching (entity resolution)
and LOCF gap-filling (time-series repair) — two pipeline staples absent
from both SQL-92 and the reference (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "fuzzy_blocked_name_pairs",
    oracle="""
        WITH p AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM p a JOIN p b
          ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
         AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    tags=("fuzzy", "dedup", "blocking", "string"),
)
def fuzzy_blocked_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: near-identical part names (Levenshtein
    <= 3) with candidate pairs restricted to a BLOCK (same head noun) —
    the standard entity-resolution pattern. The all-pairs
    edit-distance join never exists: pairs form only within a block via
    an equi-join on the blocking key, exactly like the MinHash band
    join (pipeline.py) — at 100 TB the blocking key is the shuffle
    key and block size bounds the fan-out. Levenshtein runs JVM-side
    on the (deduplicated) name table, not the fact table."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    block = F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))
    a = names.select(F.col("p_name").alias("name_a"), block.alias("block_a"))
    b = names.select(F.col("p_name").alias("name_b"), block.alias("block_b"))
    return (
        a.join(
            b,
            (F.col("block_a") == F.col("block_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist")
    )


@register(
    "locf_gap_fill_daily",
    oracle="""
        WITH spine AS (
            SELECT CAST(UNNEST(generate_series(DATE '1996-01-01',
                                               DATE '1996-03-31',
                                               INTERVAL 1 DAY)) AS DATE) AS day
        ),
        daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS rev_e4,
                   COUNT(*) AS n
            FROM orders
            WHERE o_orderpriority = '1-URGENT'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s.day, COALESCE(d.n, 0) AS n_orders,
               last_value(d.rev_e4 IGNORE NULLS) OVER (ORDER BY s.day)
                 / 10000.0 AS last_known_revenue
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    tags=("timeseries", "gap-fill", "locf", "window", "sequence"),
)
def locf_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with last-observation-carried-forward: a
    generated daily date spine left-joined to actual daily urgent-order
    revenue, missing days zero-counted and their revenue carried
    forward via last(ignorenulls) over the date order. Leading days
    before any observation stay NULL (both engines). Revenue partials
    use the exact-quantization rule. The unpartitioned LOCF window is
    fine on a 91-row spine; at scale the spine is per-entity and the
    window partitions by entity — same plan, parallel."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long")).alias("rev_e4"),
            F.count("*").alias("n"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(F.broadcast(daily), spine.day == daily.d, "left")
        .select(
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
            (F.last("rev_e4", ignorenulls=True).over(w) / F.lit(10000.0)).alias(
                "last_known_revenue"
            ),
        )
    )
