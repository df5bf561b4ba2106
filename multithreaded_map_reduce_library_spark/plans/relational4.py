"""Relational breadth, batch 4: non-equi (theta) band join, datetime
function family, argmax/boolean aggregates, and UNPIVOT."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


from multithreaded_map_reduce_library_spark.functions.grid import gavg  # noqa: E402


_BANDS = [
    ("tiny", 0.0, 25_000.0),
    ("small", 25_000.0, 75_000.0),
    ("mid", 75_000.0, 200_000.0),
    ("large", 200_000.0, 400_000.0),
    ("huge", 400_000.0, 1e18),
]


@register(
    "theta_band_join_orders",
    oracle=f"""
        SELECT b.band, COUNT(*) AS n_orders,
               CAST((SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) * 100
                     + COUNT(o_totalprice) // 2) // COUNT(o_totalprice) AS BIGINT) AS avg_price_e4
        FROM orders o
        JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)})
             AS b(band, lo, hi)
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band
    """,
    tags=("join", "theta", "non-equi"),
)
def theta_band_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi (theta) join: orders matched to price bands by range
    predicate only. The band side is 5 rows, so the physical plan is a
    broadcast nested loop — the correct shape whenever one side of a theta
    join is tiny; a large-large theta join must be rewritten to grid
    bucketing (range_join_close_events) instead."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"), gavg(F.col("o_totalprice"), 2).alias("avg_price_e4"))
    )


@register(
    "datetime_function_family",
    oracle="""
        SELECT CAST(quarter(o_orderdate) AS INTEGER)            AS q,
               CAST(isodow(o_orderdate) AS INTEGER)             AS dow_iso,
               CAST(last_day(o_orderdate) AS TIMESTAMP)         AS month_end,
               CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
               strftime(o_orderdate, '%Y-%m')                   AS ym,
               COUNT(*) AS n
        FROM orders
        WHERE o_orderkey < 500
        GROUP BY 1, 2, 3, 4, 5
    """,
    tags=("scalar-date",),
)
def datetime_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: quarter, ISO weekday, last_day, add_months,
    date_format — grouped so the oracle compares a compact result."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.groupBy(
        F.quarter("o_orderdate").alias("q"),
        F.weekday("o_orderdate").cast("int").alias("dow_iso0"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp_ntz").alias("plus_3m"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    ).agg(F.count("*").alias("n")).select(
        "q",
        # Spark weekday(): Monday=0; DuckDB isodow: Monday=1.
        (F.col("dow_iso0") + 1).alias("dow_iso"),
        "month_end",
        "plus_3m",
        "ym",
        "n",
    )


@register(
    "argmax_bool_aggs",
    oracle="""
        SELECT o_orderstatus,
               arg_max(o_orderkey, o_totalprice)   AS top_order,
               arg_min(o_orderkey, o_totalprice)   AS bottom_order,
               CAST(bool_and(o_totalprice > 0) AS BOOLEAN)      AS all_positive,
               CAST(bool_or(o_totalprice > 400000) AS BOOLEAN)  AS any_huge
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg", "argmax", "bool"),
)
def argmax_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax) and every/some boolean aggregates. Safe for
    hash-compare because o_totalprice values tie-free within groups for
    the argmax targets (verified: duplicates would make arg_max
    engine-dependent)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_totalprice") > 400000).alias("any_huge"),
    )


@register(
    "unpivot_lineitem_metrics",
    oracle="""
        SELECT l_returnflag, metric,
               CAST((SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) * 100
                     + COUNT(value) // 2) // COUNT(value) AS BIGINT) AS avg_value_e4
        FROM (
            SELECT l_returnflag, 'quantity' AS metric, l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'discount', l_discount FROM lineitem
        )
        GROUP BY l_returnflag, metric
    """,
    tags=("unpivot", "agg"),
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide metric columns to (metric, value) rows — the
    Expand-based inverse of pivot; one scan, not three."""
    l = load_table(spark, sf_dir, "lineitem")
    melted = l.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric_col",
        "value",
    )
    metric = (
        F.when(F.col("metric_col") == "l_quantity", "quantity")
        .when(F.col("metric_col") == "l_extendedprice", "price")
        .otherwise("discount")
    )
    return (
        melted.select("l_returnflag", metric.alias("metric"), "value")
        .groupBy("l_returnflag", "metric")
        .agg(gavg(F.col("value"), 2).alias("avg_value_e4"))
    )
