"""Pipeline batch 58: un-normalized Haar wavelet decomposition of the
daily value series (two levels of pairwise sum/difference — EXACT
integers, no sqrt(2) normalization) and the Lorenz curve deciles
completing `gini_revenue_concentration` with its plottable curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "haar_wavelet_daily",
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS v_q
            FROM events GROUP BY day
        ),
        idx AS (
            SELECT v_q, ROW_NUMBER() OVER (ORDER BY day ASC) AS i FROM d
        ),
        l1 AS (
            SELECT (i + 1) // 2 AS k,
                   SUM(CASE WHEN i % 2 = 1 THEN v_q ELSE 0 END) AS v1,
                   SUM(CASE WHEN i % 2 = 0 THEN v_q ELSE 0 END) AS v2,
                   COUNT(*) AS m
            FROM idx GROUP BY k HAVING COUNT(*) = 2
        ),
        c1 AS (SELECT k, v1 + v2 AS a1, v1 - v2 AS d1 FROM l1),
        l2 AS (
            SELECT (k + 1) // 2 AS k2,
                   SUM(CASE WHEN k % 2 = 1 THEN a1 ELSE 0 END) AS a1a,
                   SUM(CASE WHEN k % 2 = 0 THEN a1 ELSE 0 END) AS a1b,
                   COUNT(*) AS m
            FROM c1 GROUP BY k2 HAVING COUNT(*) = 2
        )
        SELECT 1 AS level, k AS pos, CAST(a1 AS BIGINT) AS approx,
               CAST(d1 AS BIGINT) AS detail FROM c1
        UNION ALL
        SELECT 2 AS level, k2 AS pos, CAST(a1a + a1b AS BIGINT) AS approx,
               CAST(a1a - a1b AS BIGINT) AS detail
        FROM l2
    """,
    tags=("time-series", "wavelet", "events", "global-sort"),
)
def haar_wavelet_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level un-normalized Haar wavelet decomposition of the daily
    value series: level-1 pairs days into (sum, difference) and level-2
    repeats on the sums — detail coefficients localize WHEN the series
    jumped (the multiresolution complement of the global CUSUM), and
    the un-normalized transform keeps every coefficient an EXACT
    integer (cent grid, no sqrt(2)). Odd tails are dropped per level
    (HAVING COUNT(*)=2), the standard truncation.

    Scale design: the series is calendar-bounded; each level is a
    half-size grouped aggregate — log2(n) skinny passes in general,
    two here. Wavelet compression of metrics at 100 TB runs per
    series-key with identical shape.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")).alias("v_q")
    )
    idx = d.select(
        "v_q", F.row_number().over(Window.orderBy(F.asc("day"))).alias("i")
    )
    l1 = (
        idx.groupBy(((F.col("i") + 1) / 2).cast("bigint").alias("k"))
        .agg(
            F.sum(F.when(F.col("i") % 2 == 1, F.col("v_q")).otherwise(0)).alias("v1"),
            F.sum(F.when(F.col("i") % 2 == 0, F.col("v_q")).otherwise(0)).alias("v2"),
            F.count("*").alias("m"),
        )
        .where(F.col("m") == 2)
    )
    c1 = l1.select(
        "k", (F.col("v1") + F.col("v2")).alias("a1"), (F.col("v1") - F.col("v2")).alias("d1")
    )
    l2 = (
        c1.groupBy(((F.col("k") + 1) / 2).cast("bigint").alias("k2"))
        .agg(
            F.sum(F.when(F.col("k") % 2 == 1, F.col("a1")).otherwise(0)).alias("a1a"),
            F.sum(F.when(F.col("k") % 2 == 0, F.col("a1")).otherwise(0)).alias("a1b"),
            F.count("*").alias("m"),
        )
        .where(F.col("m") == 2)
    )
    out1 = c1.select(
        F.lit(1).cast("int").alias("level"),
        F.col("k").alias("pos"),
        F.col("a1").alias("approx"),
        F.col("d1").alias("detail"),
    )
    out2 = l2.select(
        F.lit(2).cast("int").alias("level"),
        F.col("k2").alias("pos"),
        (F.col("a1a") + F.col("a1b")).alias("approx"),
        (F.col("a1a") - F.col("a1b")).alias("detail"),
    )
    return out1.unionAll(out2)


@register(
    "lorenz_curve_deciles",
    oracle="""
        WITH r AS (
            SELECT o_custkey,
                   SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_q
            FROM orders GROUP BY o_custkey
        ),
        k AS (
            SELECT rev_q,
                   NTILE(10) OVER (ORDER BY rev_q ASC, o_custkey ASC) AS decile
            FROM r
        ),
        g AS (SELECT SUM(rev_q) AS tot FROM k),
        dec AS (
            SELECT decile, COUNT(*) AS n_customers, SUM(rev_q) AS dec_rev
            FROM k GROUP BY decile
        )
        SELECT decile, n_customers, CAST(dec_rev AS BIGINT) AS dec_rev,
               CAST((CAST(SUM(dec_rev) OVER (ORDER BY decile ASC
                                             ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000
                     + CAST(g.tot AS BIGINT) // 2) // CAST(g.tot AS BIGINT) AS BIGINT)
                   AS cum_share_e6
        FROM dec CROSS JOIN g
    """,
    tags=("analytics", "inequality", "lorenz", "orders", "ntile", "global-sort"),
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at decile resolution: customers sorted by revenue
    into NTILE(10) bins (custkey tiebreak), each bin's revenue and the
    cumulative share — the plottable curve whose area complement is
    `gini_revenue_concentration`'s number. Integer sums, one display
    division per row.

    Scale design: a customer-grain aggregate, one NTILE over the
    |customers| relation, a 10-row rollup with a cumulative window.
    """
    orders = load_table(spark, sf_dir, "orders")
    r = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")).alias(
            "rev_q"
        )
    )
    k = r.select(
        "rev_q",
        F.ntile(10)
        .over(Window.orderBy(F.asc("rev_q"), F.asc("o_custkey")))
        .alias("decile"),
    )
    g = k.agg(F.sum("rev_q").alias("tot"))
    dec = k.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("rev_q").alias("dec_rev")
    )
    wcum = Window.orderBy(F.asc("decile")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return dec.crossJoin(F.broadcast(g)).select(
        "decile",
        "n_customers",
        "dec_rev",
        int_ratio(F.sum("dec_rev").over(wcum), F.col("tot"), 6).alias(
            "cum_share_e6"
        ),
    )
