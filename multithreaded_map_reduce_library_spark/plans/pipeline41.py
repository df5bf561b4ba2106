"""Pipeline batch 41: a Simpson's-paradox scan (aggregate-vs-group
correlation sign flips, decided entirely on exact integers) and the
order aging-bucket report.

The paradox FLAG uses only the SIGN of n*Sxy - Sx*Sy — a BIGINT — so
the detection itself involves zero floating point; correlations are
displayed rounded for humans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "simpsons_paradox_scan",
    oracle="""
        WITH e AS (
            SELECT event_type,
                   CAST(hour(ts) AS BIGINT) AS x,
                   CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS y
            FROM events
        ),
        g AS (
            SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM e GROUP BY event_type
        ),
        a AS (
            SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM e
        )
        SELECT g.event_type, g.n,
               CAST(FLOOR(CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                     / sqrt(CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)
                            * (CAST(g.n AS DOUBLE) * g.syy
                               - CAST(g.sy AS DOUBLE) * g.sy))
                     * 1000000.0 + 0.5) AS BIGINT) AS corr_group_e6,
               CAST(FLOOR(CAST(a.n * a.sxy - a.sx * a.sy AS DOUBLE)
                     / sqrt(CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE)
                            * (CAST(a.n AS DOUBLE) * a.syy
                               - CAST(a.sy AS DOUBLE) * a.sy))
                     * 1000000.0 + 0.5) AS BIGINT) AS corr_all_e6,
               (CASE WHEN g.n * g.sxy - g.sx * g.sy > 0 THEN 1
                     WHEN g.n * g.sxy - g.sx * g.sy < 0 THEN -1 ELSE 0 END)
               <> (CASE WHEN a.n * a.sxy - a.sx * a.sy > 0 THEN 1
                        WHEN a.n * a.sxy - a.sx * a.sy < 0 THEN -1 ELSE 0 END)
                   AS sign_flip
        FROM g CROSS JOIN a
    """,
    tags=("statistics", "simpson", "correlation", "events"),
)
def simpsons_paradox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox scan: the hour-of-day vs value correlation per
    event type against the pooled correlation — a per-group trend whose
    SIGN disagrees with the aggregate is the classic confounding red
    flag (report the aggregate and you report the wrong direction).
    The flip decision compares signs of the exact BIGINT covariance
    numerators — no float enters the flag; displayed correlations
    round the usual sufficient-statistics form.

    Scale design: one pass building six integer sums per group plus the
    pooled six (map-side combined); the comparison is a 5-row
    broadcast cross-join. The sufficient-statistics layout means any
    group count scales.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("y"),
    )

    def stats(df, keys):
        return df.groupBy(*keys).agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )

    g = stats(e, ["event_type"])
    # grand aggregate (keys=[]) so the broadcast build side is scalar
    a = e.agg(
        F.count("*").alias("an"),
        F.sum("x").alias("asx"),
        F.sum("y").alias("asy"),
        F.sum(F.col("x") * F.col("y")).alias("asxy"),
        F.sum(F.col("x") * F.col("x")).alias("asxx"),
        F.sum(F.col("y") * F.col("y")).alias("asyy"),
    )

    def corr(n, sx, sy, sxy, sxx, syy):
        num = (F.col(n) * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        # the y-moment factor multiplies IN DOUBLE (n*syy would overflow
        # int64 at larger scale factors; identical expression both engines)
        den = F.sqrt(
            (F.col(n) * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
            * (
                F.col(n).cast("double") * F.col(syy)
                - F.col(sy).cast("double") * F.col(sy)
            )
        )
        return grid(num / den, 6)

    def signum(n, sx, sy, sxy):
        v = F.col(n) * F.col(sxy) - F.col(sx) * F.col(sy)
        return F.when(v > 0, 1).when(v < 0, -1).otherwise(0)

    return g.crossJoin(F.broadcast(a)).select(
        "event_type",
        "n",
        corr("n", "sx", "sy", "sxy", "sxx", "syy").alias("corr_group_e6"),
        corr("an", "asx", "asy", "asxy", "asxx", "asyy").alias("corr_all_e6"),
        (
            signum("n", "sx", "sy", "sxy") != signum("an", "asx", "asy", "asxy")
        ).alias("sign_flip"),
    )


@register(
    "order_aging_buckets",
    oracle="""
        WITH mx AS (SELECT MAX(o_orderdate) AS asof FROM orders),
        a AS (
            SELECT o_orderstatus,
                   CAST(mx.asof AS DATE) - CAST(o_orderdate AS DATE) AS age_days,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM orders CROSS JOIN mx
        ),
        b AS (
            SELECT o_orderstatus,
                   CASE WHEN age_days <= 30 THEN 0
                        WHEN age_days <= 60 THEN 1
                        WHEN age_days <= 90 THEN 2
                        ELSE 3 END AS bucket,
                   cents
            FROM a
        )
        SELECT o_orderstatus, bucket, COUNT(*) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM b GROUP BY o_orderstatus, bucket
    """,
    tags=("analytics", "aging", "orders"),
)
def order_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order aging report: orders bucketed by age relative to the
    newest order date (0-30 / 31-60 / 61-90 / 90+ days) per status,
    with cent-grid totals — the accounts-receivable-style aging view
    every operations dashboard carries. Pure integers.

    Scale design: a 1-row max-date broadcast and one bucketed rollup
    (map-side combined) — single corpus pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("asof"))
    a = orders.crossJoin(F.broadcast(mx)).select(
        "o_orderstatus",
        F.datediff("asof", "o_orderdate").alias("age_days"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("cents"),
    )
    b = a.select(
        "o_orderstatus",
        F.when(F.col("age_days") <= 30, 0)
        .when(F.col("age_days") <= 60, 1)
        .when(F.col("age_days") <= 90, 2)
        .otherwise(3)
        .alias("bucket"),
        "cents",
    )
    return b.groupBy("o_orderstatus", "bucket").agg(
        F.count("*").alias("n_orders"), F.sum("cents").alias("total_cents")
    )
