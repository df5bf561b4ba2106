"""Pipeline batch 99 (round 4): ANOVA + THEIL INDEX + DIFF-IN-DIFF —
three classical analyses over exact integer power sums:

* ``anova_value_by_type`` — one-way ANOVA F statistic of event value
  across event types: between/within sums of squares from exact integer
  (cents) group sums, combined with the repo's products-in-double
  discipline, plus the eta² effect size. The continuous-outcome
  complement of the categorical ``chi2_event_weekday``.
* ``theil_index_inequality`` — the Theil-T inequality index of daily
  revenue, (1/n)·Σ (x/μ)ln(x/μ): the entropy-based member of the
  inequality family next to ``gini_revenue_concentration`` and
  ``lorenz_curve_deciles`` (Theil is additively decomposable by
  subgroup — the property Gini lacks).
* ``did_weekend_effect`` — the 2×2 difference-in-differences layout on
  (first half vs second half of the observation window) × (weekday vs
  weekend) purchase revenue per event: four exact cell means and the
  DiD estimate, the textbook causal-inference primitive the registry's
  attribution/IPS queries did not yet cover.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
statistics tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import duck_int_ratio, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_CENTS = "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)"


@register(
    "anova_value_by_type",
    oracle=f"""
        WITH g AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM({_CENTS}) AS BIGINT) AS s_g,
                   CAST(SUM({_CENTS} * {_CENTS}) AS BIGINT) AS q_g
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(SUM(s_g) AS BIGINT) AS s,
                   CAST(SUM(q_g) AS BIGINT) AS q,
                   SUM(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)) AS sg2n
            FROM g
        )
        SELECT n, k,
               CAST(FLOOR((sg2n - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(q AS DOUBLE) - sg2n)
                    * CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT) AS f_e6,
               CAST(FLOOR((sg2n - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS eta2_e6
        FROM agg
    """,
    tags=("statistics", "anova", "events"),
)
def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value (cents) across the five event types:
    F = (SSB/(k−1))/(SSW/(n−k)) and eta² = SSB/SST, both evaluated from
    exact integer group sums (n_g, Σx, Σx²) with every squared sum
    formed as a PRODUCT IN DOUBLE (the repo rule — bigint squares of
    corpus-scale sums overflow; the double products are bit-identical
    cross-engine because the inputs are exact integers below 2^53).

    Scale design: one fact scan to a 5-row group rollup, then scalar
    arithmetic. The power-sums-then-closed-form shape is how ANOVA runs
    at any scale — no per-group variance passes."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    g = (
        ev.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_g"),
            F.sum(cents).cast("bigint").alias("s_g"),
            F.sum(cents * cents).cast("bigint").alias("q_g"),
        )
    )
    agg = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").cast("bigint").alias("q"),
        F.sum(
            F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("sg2n"),
    )
    ssb = F.col("sg2n") - F.col("s").cast("double") * F.col("s").cast("double") / F.col(
        "n"
    ).cast("double")
    ssw = F.col("q").cast("double") - F.col("sg2n")
    sst = F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast(
        "double"
    ) / F.col("n").cast("double")
    f_stat = ssb / ssw * (F.col("n") - F.col("k")).cast("double") / (
        F.col("k") - 1
    ).cast("double")
    return agg.select(
        "n",
        "k",
        F.floor(f_stat * 1000000.0 + F.lit(0.5)).cast("bigint").alias("f_e6"),
        F.floor(ssb / sst * 1000000.0 + F.lit(0.5)).cast("bigint").alias("eta2_e6"),
    )


@register(
    "theil_index_inequality",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM({_CENTS}) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
            FROM daily
        ),
        terms AS (
            SELECT CASE WHEN cents > 0 THEN
                       CAST(FLOOR(CAST(cents AS DOUBLE) / CAST(s AS DOUBLE)
                            * ln(CAST(cents AS DOUBLE) * CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
                            * 1000000000.0 + 0.5) AS BIGINT)
                   ELSE 0 END AS term_e9,
                   n
            FROM daily CROSS JOIN tot
        )
        SELECT MAX(n) AS n_days,
               CAST(SUM(term_e9) AS BIGINT) AS theil_e9
        FROM terms
    """,
    tags=("statistics", "inequality", "theil", "events"),
)
def theil_index_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of daily purchase revenue:
    T = Σ (x_i/S)·ln(x_i·n/S) — 0 for perfectly equal days, ln(n) at
    maximal concentration. Per-day terms are e9-grid integers built from
    exact integer cents and the corpus totals (ratios and ln evaluated
    identically in double both engines; zero-revenue days contribute 0
    by the x·ln(x)→0 limit, guarded explicitly). The entropy member of
    the inequality family — unlike Gini it decomposes additively by
    subgroup, which is why corpus-mix audits prefer it.

    Scale design: one fact scan to the day rollup, one 1-row total
    broadcast, one grand aggregate — no global sort (Gini needs one;
    Theil doesn't, which also makes it the cheaper metric at scale)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    daily = (
        ev.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    tot = daily.agg(
        F.count("*").cast("bigint").alias("n"), F.sum("cents").cast("bigint").alias("s")
    )
    x = F.col("cents").cast("double")
    term = F.when(
        F.col("cents") > 0,
        F.floor(
            x
            / F.col("s").cast("double")
            * F.log(x * F.col("n").cast("double") / F.col("s").cast("double"))
            * 1000000000.0
            + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        daily.crossJoin(F.broadcast(tot))
        .select(term.alias("term_e9"), "n")
        .agg(F.max("n").alias("n_days"), F.sum("term_e9").cast("bigint").alias("theil_e9"))
    )


_DUCK_WEEKEND = "(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) IN (2, 3)"


@register(
    "did_weekend_effect",
    oracle=f"""
        WITH pts AS (
            SELECT {_CENTS} AS cents,
                   CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS we,
                   CAST(ts AS DATE) AS day
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
        ),
        mid AS (
            SELECT MIN(day) + CAST((MAX(day) - MIN(day)) // 2 AS INTEGER) AS cut FROM pts
        ),
        cells AS (
            SELECT CASE WHEN day > cut THEN 1 ELSE 0 END AS post, we,
                   CAST(COUNT(*) AS BIGINT) AS n_c,
                   CAST(SUM(cents) AS BIGINT) AS s_c
            FROM pts CROSS JOIN mid
            GROUP BY 1, 2
        )
        SELECT CAST(SUM(n_c) AS BIGINT) AS n_events,
               {duck_int_ratio("SUM(CASE WHEN post = 0 AND we = 0 THEN s_c ELSE 0 END)",
                               "SUM(CASE WHEN post = 0 AND we = 0 THEN n_c ELSE 0 END)", 2)} AS pre_wd_mean_e2,
               {duck_int_ratio("SUM(CASE WHEN post = 0 AND we = 1 THEN s_c ELSE 0 END)",
                               "SUM(CASE WHEN post = 0 AND we = 1 THEN n_c ELSE 0 END)", 2)} AS pre_we_mean_e2,
               {duck_int_ratio("SUM(CASE WHEN post = 1 AND we = 0 THEN s_c ELSE 0 END)",
                               "SUM(CASE WHEN post = 1 AND we = 0 THEN n_c ELSE 0 END)", 2)} AS post_wd_mean_e2,
               {duck_int_ratio("SUM(CASE WHEN post = 1 AND we = 1 THEN s_c ELSE 0 END)",
                               "SUM(CASE WHEN post = 1 AND we = 1 THEN n_c ELSE 0 END)", 2)} AS post_we_mean_e2
        FROM cells
    """,
    tags=("statistics", "causal", "diff-in-diff", "events"),
)
def did_weekend_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences layout on purchase value: period (first
    vs second half of the observed day range, integer midpoint cut) ×
    day type (weekday vs weekend). Emits the four exact cell means in
    cents-scale e2 integers (exact half-up ratios of integer sums); the
    DiD estimate is (post_we − pre_we) − (post_wd − pre_wd), left to
    the reader so every displayed number is a primary exact quantity.
    The textbook parallel-trends causal primitive next to the repo's
    attribution and IPS queries.

    Scale design: one fact scan to a 4-cell rollup (the date cut is a
    1-row broadcast); everything displayed is a ratio of exact integer
    sums — nothing here gets harder at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    weekend = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) % 7
    ).isin(2, 3)
    pts = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        cents.alias("cents"),
        F.when(weekend, 1).otherwise(0).alias("we"),
        F.col("ts").cast("date").alias("day"),
    )
    mid = pts.agg(
        F.date_add(
            F.min("day"),
            F.call_function(
                "div",
                F.datediff(F.max("day"), F.min("day")).cast("bigint"),
                F.lit(2).cast("bigint"),
            ).cast("int"),
        ).alias("cut")
    )
    cells = (
        pts.crossJoin(F.broadcast(mid))
        .groupBy(
            F.when(F.col("day") > F.col("cut"), 1).otherwise(0).alias("post"), "we"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_c"),
            F.sum("cents").cast("bigint").alias("s_c"),
        )
    )

    def cell(post: int, we: int, part: str) -> F.Column:
        flag = (F.col("post") == post) & (F.col("we") == we)
        return F.sum(F.when(flag, F.col(part)).otherwise(0))

    return cells.agg(
        F.sum("n_c").cast("bigint").alias("n_events"),
        int_ratio(cell(0, 0, "s_c"), cell(0, 0, "n_c"), 2).alias("pre_wd_mean_e2"),
        int_ratio(cell(0, 1, "s_c"), cell(0, 1, "n_c"), 2).alias("pre_we_mean_e2"),
        int_ratio(cell(1, 0, "s_c"), cell(1, 0, "n_c"), 2).alias("post_wd_mean_e2"),
        int_ratio(cell(1, 1, "s_c"), cell(1, 1, "n_c"), 2).alias("post_we_mean_e2"),
    )
