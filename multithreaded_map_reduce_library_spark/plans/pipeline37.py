"""Pipeline batch 37: time-series composition and deterministic
bootstrap — a rolling 7-day median smoother (exact, rank-picked), the
seasonally-adjusted daily series composing the weekday index, and
md5-seeded empirical-distribution draws (the reproducible bootstrap).

All integer-grid arithmetic with fixed-order display divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "rolling_7d_median_daily",
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS v_q
            FROM events GROUP BY day
        ),
        w AS (
            SELECT day, v_q,
                   list(v_q) OVER (ORDER BY day ASC
                                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                       AS trail
            FROM d
        )
        SELECT day,
               CAST(v_q AS BIGINT) AS v_e6,
               CAST(list_sort(trail)[(len(trail) + 1) // 2] AS BIGINT) AS med7_e6
        FROM w
    """,
    tags=("time-series", "rolling", "median", "events", "global-sort"),
)
def rolling_7d_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day median of the daily value total — the robust
    smoother that ignores single-day spikes where a rolling mean
    chases them. The median is the EXACT lower median of the trailing
    window's grid integers (collect the <=7-element frame, sort, pick
    rank (n+1)/2) — no approximation, no float comparisons.

    Scale design: the window input is the |days| relation (calendar-
    bounded); the <=7-element frame collect is constant-size state per
    row. The corpus-sized work is one day-keyed aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint")).alias("v_q")
    )
    w = Window.orderBy(F.asc("day")).rowsBetween(-6, 0)
    trail = F.sort_array(F.collect_list("v_q").over(w))
    med = F.element_at(trail, ((F.size(trail) + 1) / 2).cast("int"))
    return d.select(
        "day",
        F.col("v_q").cast("bigint").alias("v_e6"),
        med.cast("bigint").alias("med7_e6"),
    )


@register(
    "seasonal_adjusted_daily",
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
        SELECT d.day,
               CAST(d.v_q AS BIGINT) AS v_e6,
               CAST(FLOOR((CAST(d.v_q AS DOUBLE)
                      / (CAST(w.sum_w AS DOUBLE) * CAST(g.n_days AS DOUBLE)
                         / (CAST(w.n_w AS DOUBLE) * CAST(g.tot AS DOUBLE))))
                     / 1000000.0 * 1000000.0 + 0.5) AS BIGINT) AS adjusted_e6
        FROM d
        JOIN w ON dayofweek(d.day) + 1 = w.weekday
        CROSS JOIN g
    """,
    tags=("time-series", "seasonality", "decomposition", "events"),
)
def seasonal_adjusted_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted daily series: each day's total divided by its
    weekday's seasonal index (`weekday_seasonal_index`) — the
    deseasonalized series a forecaster trends on, composing the index
    query end to end. The index stays an exact ratio of integer
    products until the one fixed-order display division chain.

    Scale design: the day aggregate feeds both the 7-row weekday rollup
    (broadcast back) and the 1-row total; per-day adjustment is a
    broadcast join — nothing beyond the first aggregate scales with the
    corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint")).alias("v_q")
    )
    g = d.agg(F.count("*").alias("n_days"), F.sum("v_q").alias("tot"))
    w = d.groupBy(F.dayofweek("day").alias("weekday")).agg(
        F.count("*").alias("n_w"), F.sum("v_q").alias("sum_w")
    )
    # Products formed in DOUBLE from the exact integer sums (identical
    # expression in the oracle; BIGINT products would overflow at scale).
    idx = (
        F.col("sum_w").cast("double") * F.col("n_days").cast("double")
    ) / (F.col("n_w").cast("double") * F.col("tot").cast("double"))
    return (
        d.join(F.broadcast(w), F.dayofweek("day") == F.col("weekday"))
        .crossJoin(F.broadcast(g))
        .select(
            "day",
            F.col("v_q").cast("bigint").alias("v_e6"),
            grid(
                (F.col("v_q").cast("double") / idx) / 1000000.0, 6
            ).alias("adjusted_e6"),
        )
    )


_BOOT_N = 100


@register(
    "empirical_bootstrap_draws",
    oracle=f"""
        WITH v AS (
            SELECT value, event_id,
                   ROW_NUMBER() OVER (ORDER BY value ASC, event_id ASC) AS rk,
                   COUNT(*) OVER () AS n
            FROM events
        ),
        s AS (
            SELECT unnest(generate_series(0, {_BOOT_N - 1})) AS draw_id
        ),
        pick AS (
            SELECT s.draw_id,
                   1 + CAST(('0x' || substr(md5(CAST(s.draw_id AS VARCHAR)), 1, 12))
                            AS BIGINT) % (SELECT MAX(n) FROM v) AS rk
            FROM s
        )
        SELECT p.draw_id, CAST(FLOOR(v.value * 1000000.0 + 0.5) AS BIGINT) AS sampled_e6
        FROM pick p JOIN v ON v.rk = p.rk
    """,
    tags=("sampling", "bootstrap", "synthetic", "events", "global-sort"),
)
def empirical_bootstrap_draws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap: 100 draws from the empirical value
    distribution, each draw's rank chosen by a 48-bit md5 of the draw
    id (the repo's seedless sampling trick — reproducible across runs,
    engines, and partitionings, unlike any RNG-based resampler). This
    is inverse-CDF sampling at md5-uniforms: the substrate for bootstrap
    confidence intervals and synthetic smoke-test data.

    Scale design: the global rank is the only big operation (at 100 TB:
    sample via the equi-depth histogram — pick a bucket then a rank
    within it, same md5 stream); the 100 picks are a broadcast-joined
    100-row relation.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "value",
        F.row_number()
        .over(Window.orderBy(F.asc("value"), F.asc("event_id")))
        .alias("rk"),
    )
    n = ev.agg(F.count("*").alias("n"))
    s = ev.sparkSession.range(_BOOT_N).select(F.col("id").alias("draw_id"))
    pick = s.crossJoin(F.broadcast(n)).select(
        "draw_id",
        (
            1
            + F.conv(
                F.substring(F.md5(F.col("draw_id").cast("string")), 1, 12), 16, 10
            ).cast("bigint")
            % F.col("n")
        ).alias("rk"),
    )
    return pick.join(v, "rk").select(
        "draw_id", grid(F.col("value"), 6).alias("sampled_e6")
    )
