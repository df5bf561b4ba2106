"""Pipeline batch 54: the Kaplan-Meier survival curve for
view-to-purchase conversion WITH right-censoring — the estimator
`time_to_conversion_quartiles` approximates by dropping censored
users; KM uses them correctly (a user who never converted still
contributes at-risk time). The product-limit estimator runs as a
CUMULATIVE SUM OF GRID-QUANTIZED LOGS (each factor ln((n-d)/n)
quantized once, summed along the ordered event times — deterministic
because a window cumulative over a total order is), exponentiated only
at display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "kaplan_meier_conversion",
    oracle="""
        WITH f AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy,
                   MAX(ts) AS t_last
            FROM events GROUP BY user_id
        ),
        g AS (SELECT MAX(ts) AS t_end FROM events),
        obs AS (
            SELECT f.user_id,
                   CASE WHEN t_buy IS NOT NULL AND t_buy > t_view
                        THEN CAST(FLOOR(epoch(t_buy - t_view) / 3600) AS BIGINT)
                        ELSE CAST(FLOOR(epoch(g.t_end - t_view) / 3600) AS BIGINT)
                   END AS t_hours,
                   CASE WHEN t_buy IS NOT NULL AND t_buy > t_view
                        THEN 1 ELSE 0 END AS converted
            FROM f CROSS JOIN g
            WHERE t_view IS NOT NULL
        ),
        n_all AS (SELECT COUNT(*) AS n0 FROM obs),
        ev AS (
            SELECT t_hours,
                   SUM(converted) AS d,
                   COUNT(*) AS leaving
            FROM obs GROUP BY t_hours
        ),
        risk AS (
            SELECT t_hours, d,
                   n_all.n0
                   - COALESCE(SUM(leaving) OVER (ORDER BY t_hours ASC
                                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND 1 PRECEDING), 0) AS n_risk
            FROM ev CROSS JOIN n_all
        ),
        steps AS (
            SELECT t_hours, d, n_risk,
                   CAST(FLOOR(ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                              * 1000000.0 + 0.5) AS BIGINT) AS lq
            FROM risk WHERE d > 0 AND n_risk > d
        )
        SELECT t_hours, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
               CAST(FLOOR(exp(CAST(SUM(lq) OVER (ORDER BY t_hours ASC
                                            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                         / 1000000.0) * 1000000.0 + 0.5) AS BIGINT) AS survival_e6
        FROM steps
    """,
    tags=("statistics", "survival", "kaplan-meier", "events", "global-sort"),
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit curve for view->purchase conversion:
    S(t) = prod over conversion times <= t of (1 - d_i / n_i), where
    censored users (viewed, never purchased) leave the risk set at the
    corpus end instead of being discarded — the unbiased version of
    the naive time-to-conversion distribution. Factors accumulate as a
    cumulative sum of 1e6-grid-quantized logs along the ordered event
    times (window over a total order = deterministic), exp+round only
    at display.

    Scale design: one user-keyed conditional-min aggregate; the curve
    itself lives on the |distinct event times| relation (window
    cumulative) — at 100 TB the times pre-bucket to hours exactly as
    here and nothing else changes.
    """
    evd = load_table(spark, sf_dir, "events")
    f = evd.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    g = evd.agg(F.max("ts").alias("t_end"))
    conv = F.col("t_buy").isNotNull() & (F.col("t_buy") > F.col("t_view"))
    obs = (
        f.where(F.col("t_view").isNotNull())
        .crossJoin(F.broadcast(g))
        .select(
            F.when(
                conv,
                F.floor(
                    (F.unix_timestamp("t_buy") - F.unix_timestamp("t_view")) / 3600
                ).cast("bigint"),
            )
            .otherwise(
                F.floor(
                    (F.unix_timestamp("t_end") - F.unix_timestamp("t_view")) / 3600
                ).cast("bigint")
            )
            .alias("t_hours"),
            F.when(conv, 1).otherwise(0).alias("converted"),
        )
    )
    n_all = obs.agg(F.count("*").alias("n0"))
    ev = obs.groupBy("t_hours").agg(
        F.sum("converted").alias("d"), F.count("*").alias("leaving")
    )
    w_prev = Window.orderBy(F.asc("t_hours")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = ev.crossJoin(F.broadcast(n_all)).select(
        "t_hours",
        "d",
        (
            F.col("n0") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    steps = risk.where((F.col("d") > 0) & (F.col("n_risk") > F.col("d"))).select(
        "t_hours",
        "d",
        "n_risk",
        F.floor(
            F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk"))
            * 1000000.0
            + 0.5
        )
        .cast("bigint")
        .alias("lq"),
    )
    w_cum = Window.orderBy(F.asc("t_hours")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return steps.select(
        "t_hours",
        "n_risk",
        "d",
        grid(
            F.exp(F.sum("lq").over(w_cum).cast("double") / 1000000.0), 6
        ).alias("survival_e6"),
    )
