"""Pipeline batch 33: position-based (U-shaped) attribution with exact
integer allocation, and the weekday seasonality index — two classic
analytics primitives finishing the attribution and time-series tiers.

Money discipline (proration_largest_remainder rule): attribution
splits cent-grid integers with largest-remainder rounding, so each
purchase's credits sum to its value EXACTLY; the seasonality index is
a single division of exact integer products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "position_attribution_purchases",
    oracle="""
        WITH p AS (
            SELECT event_id AS purchase_id, user_id, ts AS p_ts,
                   CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        tp AS (
            SELECT p.purchase_id, p.cents, c.event_id AS touch_id, c.ts AS c_ts
            FROM p JOIN events c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts < p.p_ts AND c.ts >= p.p_ts - INTERVAL 24 HOURS
        ),
        r AS (
            SELECT purchase_id, cents, touch_id,
                   ROW_NUMBER() OVER (PARTITION BY purchase_id
                                      ORDER BY c_ts ASC, touch_id ASC) AS pos,
                   COUNT(*) OVER (PARTITION BY purchase_id) AS n_touch
            FROM tp
        ),
        base AS (
            SELECT purchase_id, cents, touch_id, pos, n_touch,
                   -- integer credit floor: cents * weight-numerator / 100
                   -- with middle touches sharing the 20% equally; all in
                   -- EXACT integer arithmetic over (cents * units)
                   CASE WHEN n_touch <= 2 THEN (cents * 100) // (n_touch * 100)
                        WHEN pos = 1 OR pos = n_touch
                             THEN (cents * 40) // 100
                        ELSE (cents * 20) // (100 * (n_touch - 2))
                   END AS credit_floor,
                   CASE WHEN n_touch <= 2 THEN (cents * 100) % (n_touch * 100)
                        WHEN pos = 1 OR pos = n_touch THEN (cents * 40) % 100
                        ELSE (cents * 20) % (100 * (n_touch - 2))
                   END AS frac
            FROM r
        ),
        leftover AS (
            SELECT purchase_id, cents,
                   cents - SUM(credit_floor) AS extra
            FROM base GROUP BY purchase_id, cents
        ),
        ranked AS (
            SELECT b.purchase_id, b.touch_id, b.credit_floor,
                   ROW_NUMBER() OVER (PARTITION BY b.purchase_id
                                      ORDER BY b.frac DESC, b.touch_id ASC) AS frk,
                   l.extra
            FROM base b JOIN leftover l ON b.purchase_id = l.purchase_id
        ),
        credit AS (
            SELECT purchase_id, touch_id,
                   credit_floor + CASE WHEN frk <= extra THEN 1 ELSE 0 END
                       AS credit_cents
            FROM ranked
        )
        SELECT purchase_id, touch_id, credit_cents FROM credit
    """,
    tags=("attribution", "allocation", "events", "money"),
)
def position_attribution_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each purchase
    credits the clicks of the preceding 24h — 40% to the first touch,
    40% to the last, the middle 20% split evenly (1-2 touches degrade
    to even split). Credits are CENTS allocated with largest-remainder
    rounding, so per purchase they sum to the purchase value EXACTLY
    (the proration_largest_remainder invariant) — complements the
    linear (`linear_attribution_purchases`) and last-touch
    (`asof_purchase_last_click`) models.

    Scale design: the touch join is user-keyed with a 24h band
    (co-located under user bucketing; AQE handles the band within the
    key group); ranking windows run per purchase over its handful of
    touches. All integer arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("touch_id"), F.col("ts").alias("c_ts")
    )
    tp = p.join(c, "user_id").where(
        (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
    )
    wp = Window.partitionBy("purchase_id")
    r = tp.select(
        "purchase_id",
        "cents",
        "touch_id",
        F.row_number()
        .over(wp.orderBy(F.asc("c_ts"), F.asc("touch_id")))
        .alias("pos"),
        F.count("*").over(wp).alias("n_touch"),
    )
    edge = (F.col("pos") == 1) | (F.col("pos") == F.col("n_touch"))
    base = r.select(
        "purchase_id",
        "cents",
        "touch_id",
        F.when(
            F.col("n_touch") <= 2,
            (F.col("cents") * 100 / (F.col("n_touch") * 100)).cast("bigint"),
        )
        .when(edge, (F.col("cents") * 40 / 100).cast("bigint"))
        .otherwise(
            (F.col("cents") * 20 / (100 * (F.col("n_touch") - 2))).cast("bigint")
        )
        .alias("credit_floor"),
        F.when(F.col("n_touch") <= 2, (F.col("cents") * 100) % (F.col("n_touch") * 100))
        .when(edge, (F.col("cents") * 40) % 100)
        .otherwise((F.col("cents") * 20) % (100 * (F.col("n_touch") - 2)))
        .alias("frac"),
    )
    leftover = base.groupBy("purchase_id", "cents").agg(
        (F.col("cents") - F.sum("credit_floor")).alias("extra")
    )
    ranked = base.join(leftover.select("purchase_id", "extra"), "purchase_id").select(
        "purchase_id",
        "touch_id",
        "credit_floor",
        F.row_number()
        .over(wp.orderBy(F.desc("frac"), F.asc("touch_id")))
        .alias("frk"),
        "extra",
    )
    return ranked.select(
        "purchase_id",
        "touch_id",
        (
            F.col("credit_floor")
            + F.when(F.col("frk") <= F.col("extra"), 1).otherwise(0)
        ).alias("credit_cents"),
    )


@register(
    "weekday_seasonal_index",
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS v_q
            FROM events GROUP BY day
        ),
        g AS (SELECT COUNT(*) AS n_days, SUM(v_q) AS tot FROM d),
        w AS (
            SELECT dayofweek(day) + 1 AS weekday, COUNT(*) AS n_w,
                   SUM(v_q) AS sum_w
            FROM d GROUP BY weekday
        )
        SELECT w.weekday, w.n_w,
               CAST(FLOOR(CAST(w.sum_w AS DOUBLE) * CAST(g.n_days AS DOUBLE)
                     / (CAST(w.n_w AS DOUBLE) * CAST(g.tot AS DOUBLE))
                     * 1000000.0 + 0.5) AS BIGINT) AS seasonal_index_e6
        FROM w CROSS JOIN g
    """,
    tags=("time-series", "seasonality", "events"),
)
def weekday_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index: each weekday's mean daily value total
    relative to the overall daily mean — the multiplicative seasonal
    factor a forecaster divides out before trending (complements Holt
    smoothing, which models level+trend but not seasonality). Computed
    as (sum_w * n_days) / (n_w * tot): one division of exact integer
    products on the 1e6 value grid.

    Scale design: a day-keyed aggregate, a 7-row weekday rollup, and a
    broadcast 1-row total — nothing corpus-sized after the first
    map-side-combined aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint")).alias("v_q")
    )
    g = d.agg(F.count("*").alias("n_days"), F.sum("v_q").alias("tot"))
    w = d.groupBy(F.dayofweek("day").alias("weekday")).agg(
        F.count("*").alias("n_w"), F.sum("v_q").alias("sum_w")
    )
    return w.crossJoin(F.broadcast(g)).select(
        "weekday",
        "n_w",
        grid(
            F.col("sum_w").cast("double") * F.col("n_days").cast("double")
            / (F.col("n_w").cast("double") * F.col("tot").cast("double")),
            6,
        ).alias("seasonal_index_e6"),
    )
