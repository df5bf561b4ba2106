"""Pipeline batch 92 (round 4): EXACT-INTEGER DISTRIBUTION STATS — two
classical measures the drift/correlation tier was missing, both computed
with integer arithmetic end to end:

* ``histogram_emd_drift`` — the 1-D earth mover's distance (Wasserstein-1)
  between weekday and weekend purchase-value histograms. For 1-D
  distributions EMD = sum over bins of |CDF1 - CDF2|; cross-multiplying
  by both sample sizes keeps every term an exact integer
  (|cum1*N2 - cum2*N1|). Complements the KS statistic
  (``ks_test_value_drift``: max CDF gap) and total-variation drift
  (``weekly_type_mix_tv_drift``): EMD is the mass-transport area between
  the CDFs — it sees mean shifts KS underweights.
* ``spearman_daily_rank_corr`` — exact tie-corrected Spearman rank
  correlation between daily purchase revenue and daily event volume:
  doubled average ranks (2*avg-rank = 2*c_less + c_tied + 1, integers),
  integer power sums, and the Pearson-on-ranks closed form evaluated
  with the repo's products-in-double + correctly-rounded-sqrt discipline
  (the Mann-Kendall z precedent).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
statistics tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio_big,
    int_ratio_big,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_BIN_CENTS = 1000  # $10-wide histogram bins

# Portable weekend flag: days since 1970-01-01 (a Thursday) mod 7 →
# 2=Saturday, 3=Sunday. Sidesteps the engines' dayofweek base mismatch.
_DUCK_WEEKEND = "(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) IN (2, 3)"


def _spark_weekend() -> F.Column:
    d = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    return (d % 7).isin(2, 3)


@register(
    "histogram_emd_drift",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) // {_BIN_CENTS} AS bin,
                   CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS we
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
        ),
        hist AS (
            SELECT bin,
                   CAST(SUM(1 - we) AS BIGINT) AS n_wd,
                   CAST(SUM(we) AS BIGINT) AS n_we
            FROM pts GROUP BY bin
        ),
        cum AS (
            SELECT bin, n_wd, n_we,
                   CAST(SUM(n_wd) OVER (ORDER BY bin) AS BIGINT) AS cum_wd,
                   CAST(SUM(n_we) OVER (ORDER BY bin) AS BIGINT) AS cum_we,
                   CAST(SUM(n_wd) OVER () AS BIGINT) AS tot_wd,
                   CAST(SUM(n_we) OVER () AS BIGINT) AS tot_we
            FROM hist
        )
        SELECT MAX(tot_wd) AS n_weekday,
               MAX(tot_we) AS n_weekend,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM(ABS(cum_wd * tot_we - cum_we * tot_wd)) AS BIGINT) AS emd_num,
               {duck_int_ratio_big("SUM(ABS(cum_wd * tot_we - cum_we * tot_wd))", "MAX(tot_wd) * MAX(tot_we)", 6)} AS emd_bins_e6
        FROM cum
    """,
    tags=("statistics", "drift", "emd", "histogram", "events"),
)
def histogram_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D earth mover's distance between the weekday and weekend
    purchase-value histograms ($10 bins): EMD (in bin-width units) is the
    sum over bins of |CDF_wd - CDF_we|, kept integral by cross-
    multiplying with both totals — emd_num = Σ|cum_wd*N_we - cum_we*N_wd|
    — and displayed as the exact half-up e6 ratio emd_num/(N_wd*N_we)
    (overflow-safe split ratio: at 100 TB N_wd*N_we ~ 1e20 exceeds the
    e6-scaled numerator headroom long before the counts themselves
    overflow).

    Scale design: one fact scan folds to the bin histogram (bins are
    bounded by the price domain, not the row count); the cumulative
    window runs on that rollup. Weekday/weekend sit in one relation as
    paired counts, so the two CDFs need no join — and empty bins on
    either side are impossible by construction."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.call_function(
            "div",
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"),
            F.lit(_BIN_CENTS).cast("bigint"),
        ).alias("bin"),
        F.when(_spark_weekend(), 1).otherwise(0).alias("we"),
    )
    hist = pts.groupBy("bin").agg(
        F.sum(1 - F.col("we")).cast("bigint").alias("n_wd"),
        F.sum("we").cast("bigint").alias("n_we"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "bin",
        F.sum("n_wd").over(wc).cast("bigint").alias("cum_wd"),
        F.sum("n_we").over(wc).cast("bigint").alias("cum_we"),
        F.sum("n_wd").over(wall).cast("bigint").alias("tot_wd"),
        F.sum("n_we").over(wall).cast("bigint").alias("tot_we"),
    )
    term = F.abs(F.col("cum_wd") * F.col("tot_we") - F.col("cum_we") * F.col("tot_wd"))
    return cum.agg(
        F.max("tot_wd").alias("n_weekday"),
        F.max("tot_we").alias("n_weekend"),
        F.count("*").cast("bigint").alias("n_bins"),
        F.sum(term).cast("bigint").alias("emd_num"),
        int_ratio_big(F.sum(term), F.max("tot_wd") * F.max("tot_we"), 6).alias(
            "emd_bins_e6"
        ),
    )


@register(
    "spearman_daily_rank_corr",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                            THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS cents,
                   CAST(COUNT(*) AS BIGINT) AS n_ev
            FROM events GROUP BY 1
        ),
        r AS (
            SELECT
                2 * COUNT(*) OVER (ORDER BY cents
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  + COUNT(*) OVER (PARTITION BY cents) + 1 AS rx,
                2 * COUNT(*) OVER (ORDER BY n_ev
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  + COUNT(*) OVER (PARTITION BY n_ev) + 1 AS ry
            FROM daily
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(rx) AS BIGINT) AS sx,
                   CAST(SUM(ry) AS BIGINT) AS sy,
                   CAST(SUM(rx * rx) AS BIGINT) AS sxx,
                   CAST(SUM(ry * ry) AS BIGINT) AS syy,
                   CAST(SUM(rx * ry) AS BIGINT) AS sxy
            FROM r
        )
        SELECT n AS n_days,
               CAST(n * sxy - sx * sy AS BIGINT) AS spearman_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS var_x,
               CAST(n * syy - sy * sy AS BIGINT) AS var_y,
               CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS rho_e6
        FROM s
    """,
    tags=("statistics", "correlation", "spearman", "events", "global-sort"),
)
def spearman_daily_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected Spearman rank correlation between daily
    purchase revenue and daily event volume. Ranks use the doubled-
    average-rank identity (2*avg = 2*c_less + c_tied + 1 — integers even
    under ties), moments are exact integer power sums, and the
    Pearson-on-ranks closed form is evaluated as integer-derived doubles
    with one correctly-rounded sqrt — bit-identical cross-engine (the
    Mann-Kendall z discipline). The exact integer numerator and variance
    terms are emitted alongside rho_e6 so the rounding step is auditable.

    Scale design: one fact scan folds to the day rollup; both rank
    windows and the moment aggregate run on that calendar-bounded
    relation (the ranks are ≤ 2*days, so every power sum is orders of
    magnitude inside int64 at any corpus size)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(
                (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("cents"),
        F.count("*").cast("bigint").alias("n_ev"),
    )

    def r2(col: str) -> F.Column:
        less = Window.orderBy(col).rangeBetween(Window.unboundedPreceding, -1)
        eq = Window.partitionBy(col)
        return 2 * F.count("*").over(less) + F.count("*").over(eq) + 1

    r = daily.select(r2("cents").alias("rx"), r2("n_ev").alias("ry"))
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rho = num.cast("double") / F.sqrt(varx.cast("double") * vary.cast("double"))
    return s.select(
        F.col("n").alias("n_days"),
        num.cast("bigint").alias("spearman_num"),
        varx.cast("bigint").alias("var_x"),
        vary.cast("bigint").alias("var_y"),
        F.floor(rho * 1000000.0 + F.lit(0.5)).cast("bigint").alias("rho_e6"),
    )
