"""Pipeline batch 105 (round 4): EXPERIMENTATION / CAUSAL AUDIT — the
two standard pre-experiment checks an A/B platform runs on event data:

* ``cuped_adjusted_lift`` — CUPED variance reduction (Deng et al.,
  WSDM'13): per-user pre-period spend is the covariate X, post-period
  spend the metric Y, arms assigned by ``user_id % 2``. The optimal
  θ = cov(X,Y)/var(X) is computed from EXACT integer moment sums
  (n, Σx, Σy, Σxx, Σxy, Σyy in cents), the adjusted lift is
  Δ_raw − θ·(mean_x_t − mean_x_c), and the achievable variance
  reduction is ρ² = cov²/(var_x·var_y). Every double is a product /
  quotient of exact int64 values in the SAME expression shape in both
  engines, then e6-gridded.
* ``covariate_balance_smd`` — pre-period covariate balance audit
  (standardized mean difference): for four per-user pre-period
  covariates (event count, spend cents, distinct event types, active
  days), SMD = (mean_t − mean_c)/sqrt((var_t+var_c)/2) with population
  variances from exact integer moments. |SMD| < 0.1 is the usual
  "arms are balanced" gate before trusting an experiment readout.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
experimentation tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import duck_grid, grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

# Deterministic mid-corpus cut: events span 2024-01-01..2024-01-30 at
# every SF (TESTDATA.md, seed=42), so the first 15 days are "pre".
_CUT = "2024-01-16 00:00:00"


@register(
    "cuped_adjusted_lift",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(user_id % 2 AS BIGINT) AS arm,
                   CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUT}'
                            THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUT}'
                            THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y
            FROM events
            WHERE value IS NOT NULL
            GROUP BY user_id
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                   CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sxt,
                   CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
                   CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sxc,
                   CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
            FROM per_user
        )
        SELECT n AS n_users, nt AS n_treat, nc AS n_ctrl,
               {duck_grid("(CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)"
                          " / (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx)", 6)}
                   AS theta_e6,
               {duck_grid("CAST(syt AS DOUBLE) / nt - CAST(syc AS DOUBLE) / nc", 6)}
                   AS diff_raw_e6,
               {duck_grid("(CAST(syt AS DOUBLE) / nt - CAST(syc AS DOUBLE) / nc)"
                          " - ((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)"
                          "    / (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx))"
                          "   * (CAST(sxt AS DOUBLE) / nt - CAST(sxc AS DOUBLE) / nc)", 6)}
                   AS diff_cuped_e6,
               {duck_grid("((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)"
                          " * (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy))"
                          " / ((CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx)"
                          "    * (CAST(syy AS DOUBLE) * n - CAST(sy AS DOUBLE) * sy))", 6)}
                   AS var_reduction_e6
        FROM mom
    """,
    tags=("experimentation", "cuped", "causal", "events"),
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted treatment lift over events: X = pre-period spend
    (cents, first 15 days), Y = post-period spend, arm = user_id % 2.
    θ = cov(X,Y)/var(X) from exact integer moments — both engines build
    the identical double expression (products of int64-exact values, no
    data-order-dependent float sums), so the e6 grid is deterministic.
    Emits raw lift, CUPED lift, and ρ² (the variance-reduction fraction
    CUPED achieves, = 1 − var(Y−θX)/var(Y) at the optimal θ).

    Scale design: one shuffle (groupBy user_id), then a single partial-
    aggregated global moment row — the classic two-level aggregation
    that holds at any corpus size. Moment sums stay int64-exact through
    sf0.1 demo magnitudes (Σx² ≈ 2e18 < 2^63); a 100 TB deployment
    keeps them exact by summing in DECIMAL(38,0) or by pre-centering
    per-user values against a first-pass grand mean."""
    cut = F.lit(_CUT).cast("timestamp")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    per_user = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cut, cents).otherwise(0)).cast("bigint").alias("x"),
            F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0)).cast("bigint").alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    )
    t = F.col("arm") == 1
    mom = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(t, F.col("x")).otherwise(0)).cast("bigint").alias("sxt"),
        F.sum(F.when(t, F.col("y")).otherwise(0)).cast("bigint").alias("syt"),
        F.sum(F.when(~t, 1).otherwise(0)).cast("bigint").alias("nc"),
        F.sum(F.when(~t, F.col("x")).otherwise(0)).cast("bigint").alias("sxc"),
        F.sum(F.when(~t, F.col("y")).otherwise(0)).cast("bigint").alias("syc"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731 — exact int64 -> double
    cov = d("sxy") * F.col("n") - d("sx") * F.col("sy")
    vx = d("sxx") * F.col("n") - d("sx") * F.col("sx")
    vy = d("syy") * F.col("n") - d("sy") * F.col("sy")
    theta = cov / vx
    diff_raw = d("syt") / F.col("nt") - d("syc") / F.col("nc")
    diff_x = d("sxt") / F.col("nt") - d("sxc") / F.col("nc")
    return mom.select(
        F.col("n").alias("n_users"),
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_ctrl"),
        grid(theta, 6).alias("theta_e6"),
        grid(diff_raw, 6).alias("diff_raw_e6"),
        grid(diff_raw - theta * diff_x, 6).alias("diff_cuped_e6"),
        grid((cov * cov) / (vx * vy), 6).alias("var_reduction_e6"),
    )


@register(
    "covariate_balance_smd",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(user_id % 2 AS BIGINT) AS arm,
                   CAST(COUNT(*) AS BIGINT) AS ev_cnt,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS val_cents,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
                   CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
            FROM events
            WHERE ts < TIMESTAMP '{_CUT}' AND value IS NOT NULL
            GROUP BY user_id
        ),
        long AS (
            SELECT arm, 'ev_cnt' AS covariate, ev_cnt AS v FROM per_user
            UNION ALL
            SELECT arm, 'val_cents', val_cents FROM per_user
            UNION ALL
            SELECT arm, 'n_types', n_types FROM per_user
            UNION ALL
            SELECT arm, 'active_days', active_days FROM per_user
        ),
        mom AS (
            SELECT covariate,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                   CAST(SUM(CASE WHEN arm = 1 THEN v ELSE 0 END) AS BIGINT) AS st,
                   CAST(SUM(CASE WHEN arm = 1 THEN v * v ELSE 0 END) AS BIGINT) AS sst,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
                   CAST(SUM(CASE WHEN arm = 0 THEN v ELSE 0 END) AS BIGINT) AS sc,
                   CAST(SUM(CASE WHEN arm = 0 THEN v * v ELSE 0 END) AS BIGINT) AS ssc
            FROM long GROUP BY covariate
        )
        SELECT covariate, nt AS n_treat, nc AS n_ctrl,
               {duck_grid("CAST(st AS DOUBLE) / nt", 6)} AS mean_t_e6,
               {duck_grid("CAST(sc AS DOUBLE) / nc", 6)} AS mean_c_e6,
               CASE WHEN (CAST(sst AS DOUBLE) / nt
                          - (CAST(st AS DOUBLE) / nt) * (CAST(st AS DOUBLE) / nt))
                        + (CAST(ssc AS DOUBLE) / nc
                           - (CAST(sc AS DOUBLE) / nc) * (CAST(sc AS DOUBLE) / nc)) = 0
                    THEN 0
                    ELSE {duck_grid(
                        "(CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc)"
                        " / SQRT(((CAST(sst AS DOUBLE) / nt"
                        "          - (CAST(st AS DOUBLE) / nt) * (CAST(st AS DOUBLE) / nt))"
                        "         + (CAST(ssc AS DOUBLE) / nc"
                        "            - (CAST(sc AS DOUBLE) / nc) * (CAST(sc AS DOUBLE) / nc)))"
                        " / 2.0)", 6)}
               END AS smd_e6
        FROM mom
        ORDER BY covariate
    """,
    tags=("experimentation", "balance", "causal", "events"),
)
def covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-period covariate balance audit for the user_id%2 assignment:
    four per-user pre-period covariates (event count, spend cents,
    distinct event types, active days) unpivoted to long form, then per
    covariate the standardized mean difference
    (mean_t − mean_c)/sqrt((var_t + var_c)/2) with POPULATION variances
    from exact integer moments (Σv, Σv² per arm, int64-exact). A zero
    pooled variance yields SMD 0 by convention. The |SMD|<0.1 screen is
    the standard pre-readout balance gate.

    Scale design: one shuffle to per-user covariates, a constant 4×
    unpivot, then a 4-group moment aggregation with map-side partials —
    output is 4 rows regardless of corpus size."""
    cut = F.lit(_CUT).cast("timestamp")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    per_user = (
        load_table(spark, sf_dir, "events")
        .where((F.col("ts") < cut) & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("ev_cnt"),
            F.sum(cents).cast("bigint").alias("val_cents"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
            F.countDistinct(F.col("ts").cast("date")).cast("bigint").alias("active_days"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    )
    long = per_user.select(
        "arm",
        F.expr(
            "stack(4, 'ev_cnt', ev_cnt, 'val_cents', val_cents,"
            " 'n_types', n_types, 'active_days', active_days)"
        ).alias("covariate", "v"),
    )
    t = F.col("arm") == 1
    mom = long.groupBy("covariate").agg(
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(t, F.col("v")).otherwise(0)).cast("bigint").alias("st"),
        F.sum(F.when(t, F.col("v") * F.col("v")).otherwise(0)).cast("bigint").alias("sst"),
        F.sum(F.when(~t, 1).otherwise(0)).cast("bigint").alias("nc"),
        F.sum(F.when(~t, F.col("v")).otherwise(0)).cast("bigint").alias("sc"),
        F.sum(F.when(~t, F.col("v") * F.col("v")).otherwise(0)).cast("bigint").alias("ssc"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_t, mean_c = d("st") / F.col("nt"), d("sc") / F.col("nc")
    var_t = d("sst") / F.col("nt") - mean_t * mean_t
    var_c = d("ssc") / F.col("nc") - mean_c * mean_c
    smd = (mean_t - mean_c) / F.sqrt((var_t + var_c) / F.lit(2.0))
    return mom.select(
        "covariate",
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_ctrl"),
        grid(mean_t, 6).alias("mean_t_e6"),
        grid(mean_c, 6).alias("mean_c_e6"),
        F.when((var_t + var_c) == 0, F.lit(0).cast("bigint"))
        .otherwise(grid(smd, 6))
        .alias("smd_e6"),
    ).orderBy("covariate")
