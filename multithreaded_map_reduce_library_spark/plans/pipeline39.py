"""Pipeline batch 39: categorical independence testing (chi-squared
over the event-type x weekday contingency table) and cohort cumulative
revenue — the last two standard monitoring reports.

Chi-squared discipline: the per-cell contribution
(O*n - r*c)^2 / (n*r*c) is quantized once per cell (35 cells) onto the
1e4 grid and BIGINT-summed — order-invariant, with numerator/products
exact integers until the one per-cell division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "chi2_event_weekday",
    oracle="""
        WITH o AS (
            SELECT event_type, dayofweek(CAST(ts AS DATE)) + 1 AS weekday,
                   COUNT(*) AS obs
            FROM events GROUP BY event_type, weekday
        ),
        rt AS (SELECT event_type, SUM(obs) AS r FROM o GROUP BY event_type),
        ct AS (SELECT weekday, SUM(obs) AS c FROM o GROUP BY weekday),
        n AS (SELECT SUM(obs) AS n FROM o),
        cell AS (
            SELECT o.event_type, o.weekday, o.obs,
                   CAST(FLOOR(
                       CAST((o.obs * n.n - rt.r * ct.c) AS DOUBLE)
                       * (o.obs * n.n - rt.r * ct.c)
                       / (CAST(n.n AS DOUBLE) * rt.r * ct.c)
                       * 10000.0 + 0.5) AS BIGINT) AS chi_q
            FROM o JOIN rt USING (event_type) JOIN ct USING (weekday)
            CROSS JOIN n
        )
        SELECT COUNT(*) AS n_cells,
               CAST(SUM(chi_q) AS DOUBLE) / 10000.0 AS chi2,
               (COUNT(DISTINCT event_type) - 1)
                   * (COUNT(DISTINCT weekday) - 1) AS dof
        FROM cell
    """,
    tags=("statistics", "chi-squared", "independence", "events"),
)
def chi2_event_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence test on the event-type x
    weekday contingency table — "does event mix depend on the day of
    week", the categorical drift monitor beside the numeric KS test.
    Each cell's (O*n - r*c)^2 / (n*r*c) keeps numerator products in
    exact integer arithmetic (well inside int64 before the single
    division per cell), quantized to the 1e4 grid and BIGINT-summed.

    Scale design: one (type, weekday)-keyed count (35 cells, map-side
    combined), two marginal rollups and a 1-row total — test statistics
    over contingency tables never touch corpus-sized state.
    """
    ev = load_table(spark, sf_dir, "events")
    o = ev.groupBy(
        "event_type", (F.dayofweek(F.to_date("ts"))).alias("weekday")
    ).agg(F.count("*").alias("obs"))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("weekday").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    diff = F.col("obs") * F.col("n") - F.col("r") * F.col("c")
    cell = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "weekday")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "weekday",
            F.floor(
                diff.cast("double")
                * diff
                / (F.col("n").cast("double") * F.col("r") * F.col("c"))
                * 10000.0
                + 0.5
            )
            .cast("bigint")
            .alias("chi_q"),
        )
    )
    return cell.agg(
        F.count("*").alias("n_cells"),
        (F.sum("chi_q").cast("double") / 10000.0).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("weekday") - 1)
        ).alias("dof"),
    )


@register(
    "cohort_cumulative_revenue",
    oracle="""
        WITH f AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        p AS (
            SELECT f.cohort_day,
                   CAST(e.ts AS DATE) - f.cohort_day AS day_offset,
                   SUM(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT)) AS cents
            FROM events e JOIN f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(e.ts AS DATE) - f.cohort_day <= 7
            GROUP BY f.cohort_day, day_offset
        )
        SELECT cohort_day, day_offset, CAST(cents AS BIGINT) AS cents,
               CAST(SUM(cents) OVER (PARTITION BY cohort_day
                                ORDER BY day_offset ASC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        FROM p
    """,
    tags=("analytics", "cohort", "ltv", "events"),
)
def cohort_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: purchase revenue by (first-seen cohort day,
    day offset 0..7) with the running cumulative per cohort — the
    revenue twin of `cohort_retention_matrix` and the raw material of
    every payback-period chart. Cent-grid integers end to end.

    Scale design: user-keyed first-seen aggregate + user-keyed join
    (co-located under user bucketing), a (cohort, offset) rollup, and a
    cumulative window over the 8-wide offset range per cohort — bounded
    by the calendar, not the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(f, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("c"),
        )
        .where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.sum("c").alias("cents"))
    )
    w = Window.partitionBy("cohort_day").orderBy(F.asc("day_offset")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return p.select(
        "cohort_day",
        "day_offset",
        "cents",
        F.sum("cents").over(w).alias("cum_cents"),
    )
