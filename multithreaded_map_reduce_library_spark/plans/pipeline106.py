"""Pipeline batch 106 (round 4): FORECAST CALIBRATION + CUMULATIVE
HAZARD — the Murphy decomposition of the Brier score and the
Nelson-Aalen estimator, completing the calibration family
(logreg_calibration_bins, conformal_coverage_audit) and the survival
family (kaplan_meier_conversion):

* ``brier_decomposition`` — Brier score of the ' the '-count
  English-ness forecast f = min(score,10)/10 against lang='en', with
  Murphy's exact decomposition BS = REL − RES + UNC over the 11
  natural forecast bins. BS and UNC are pure integer ratios; the
  per-bin REL/RES terms are doubles built from exact int64 counts in
  the same expression shape in both engines, e9-quantized PER BIN
  before the (deterministic, 11-term) sum.
* ``nelson_aalen_conversion`` — the Nelson-Aalen cumulative hazard
  H(t) = Σ d_i/n_i for view→purchase conversion with right-censoring,
  sharing `kaplan_meier_conversion`'s risk-set construction
  (pipeline54) but accumulating EXACT integer hazard ratios
  (int_ratio(d, n_risk, 6)) along the ordered event times — no
  transcendental in the cumulative path at all; exp(−H) is applied
  only at display for the Fleming-Harrington survival curve.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
evaluation tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio,
    grid,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DUCK_K = "LEAST((len(text) - len(replace(text, ' the ', ''))) // 5, 10)"


@register(
    "brier_decomposition",
    oracle=f"""
        WITH pts AS (
            SELECT CAST({_DUCK_K} AS BIGINT) AS k,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS o
            FROM documents
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(o) AS BIGINT) AS p,
                   CAST(SUM((k - 10 * o) * (k - 10 * o)) AS BIGINT) AS sq
            FROM pts
        ),
        bins AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(o) AS BIGINT) AS pk
            FROM pts GROUP BY k
        ),
        terms AS (
            SELECT
              CAST(FLOOR(
                CAST((k * nk - 10 * pk) * (k * nk - 10 * pk) AS DOUBLE)
                  / (100.0 * nk) * 1000000000.0 + 0.5) AS BIGINT) AS rel_t,
              CAST(FLOOR(
                (CAST(pk AS DOUBLE) * n - CAST(p AS DOUBLE) * nk)
                  * (CAST(pk AS DOUBLE) * n - CAST(p AS DOUBLE) * nk)
                  / (CAST(nk AS DOUBLE) * n * n) * 1000000000.0 + 0.5) AS BIGINT)
                  AS res_t
            FROM bins CROSS JOIN tot
        )
        SELECT t.n AS n_docs, t.p AS n_pos,
               {duck_int_ratio("t.sq", "100 * t.n", 9)} AS brier_e9,
               CAST((SUM(rel_t) * 1 + t.n // 2) // t.n AS BIGINT) AS reliability_e9,
               CAST((SUM(res_t) * 1 + t.n // 2) // t.n AS BIGINT) AS resolution_e9,
               {duck_int_ratio("t.p * (t.n - t.p)", "t.n * t.n", 9)} AS uncertainty_e9
        FROM terms CROSS JOIN tot t
        GROUP BY t.n, t.p, t.sq
    """,
    tags=("evaluation", "calibration", "brier", "documents"),
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the ' the '-count
    forecast f = min(score,10)/10 vs outcome lang='en': with forecasts
    constant inside each of the 11 bins, BS = (1/100N)·Σ(k−10o)² and
    UNC = p(N−p)/N² are exact integer ratios; REL and RES are per-bin
    doubles of exact integers ((k·nk−10pk)²/(100nk) and
    (pk·N−p·nk)²/(nk·N²)), e9-gridded per bin, summed (11 terms), then
    half-up divided by N. BS ≈ REL − RES + UNC up to per-bin
    quantization (the invariant test bounds the residual).

    Scale design: one scan folds to the 11-bin rollup plus a global
    moment row (map-side combine both); the decomposition itself is
    O(bins). At 100 TB nothing changes — bins are the forecast's
    codomain, not the corpus."""
    k = F.least(
        F.floor(
            (F.length(F.col("text")) - F.length(F.replace(F.col("text"), F.lit(" the "))))
            / F.lit(5)
        ).cast("bigint"),
        F.lit(10).cast("bigint"),
    )
    pts = load_table(spark, sf_dir, "documents").select(
        k.alias("k"), F.when(F.col("lang") == "en", 1).otherwise(0).alias("o")
    )
    tot = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("o").cast("bigint").alias("p"),
        F.sum((F.col("k") - 10 * F.col("o")) * (F.col("k") - 10 * F.col("o")))
        .cast("bigint")
        .alias("sq"),
    )
    bins = pts.groupBy("k").agg(
        F.count("*").cast("bigint").alias("nk"), F.sum("o").cast("bigint").alias("pk")
    )
    j = bins.crossJoin(F.broadcast(tot))
    rel_num = (F.col("k") * F.col("nk") - 10 * F.col("pk")).cast("double")
    res_num = F.col("pk").cast("double") * F.col("n") - F.col("p").cast("double") * F.col(
        "nk"
    )
    terms = j.select(
        "n",
        "p",
        "sq",
        F.floor(rel_num * rel_num / (100.0 * F.col("nk")) * 1e9 + F.lit(0.5))
        .cast("bigint")
        .alias("rel_t"),
        F.floor(
            res_num
            * res_num
            / (F.col("nk").cast("double") * F.col("n") * F.col("n"))
            * 1e9
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("res_t"),
    )
    half_div_n = lambda s: F.call_function(  # noqa: E731 — half-up integer / n
        "div", s + F.call_function("div", F.col("n"), F.lit(2).cast("bigint")), F.col("n")
    ).cast("bigint")
    return terms.groupBy("n", "p", "sq").agg(
        F.sum("rel_t").alias("srel"), F.sum("res_t").alias("sres")
    ).select(
        F.col("n").alias("n_docs"),
        F.col("p").alias("n_pos"),
        int_ratio(F.col("sq"), F.lit(100).cast("bigint") * F.col("n"), 9).alias(
            "brier_e9"
        ),
        half_div_n(F.col("srel")).alias("reliability_e9"),
        half_div_n(F.col("sres")).alias("resolution_e9"),
        int_ratio(
            F.col("p") * (F.col("n") - F.col("p")), F.col("n") * F.col("n"), 9
        ).alias("uncertainty_e9"),
    )


@register(
    "nelson_aalen_conversion",
    oracle=f"""
        WITH f AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
            FROM events GROUP BY user_id
        ),
        g AS (SELECT MAX(ts) AS t_end FROM events),
        obs AS (
            SELECT CASE WHEN t_buy IS NOT NULL AND t_buy > t_view
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
            SELECT t_hours, SUM(converted) AS d, COUNT(*) AS leaving
            FROM obs GROUP BY t_hours
        ),
        risk AS (
            SELECT t_hours, CAST(d AS BIGINT) AS d,
                   CAST(n_all.n0
                        - COALESCE(SUM(leaving) OVER (ORDER BY t_hours ASC
                                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND 1 PRECEDING), 0) AS BIGINT)
                       AS n_risk
            FROM ev CROSS JOIN n_all
        ),
        steps AS (
            SELECT t_hours, d, n_risk,
                   {duck_int_ratio("d", "n_risk", 6)} AS hq
            FROM risk WHERE d > 0
        )
        SELECT t_hours, n_risk, d,
               CAST(SUM(hq) OVER (ORDER BY t_hours ASC ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cumhaz_e6,
               CAST(FLOOR(exp(-CAST(SUM(hq) OVER (ORDER BY t_hours ASC
                                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                              / 1000000.0) * 1000000.0 + 0.5) AS BIGINT)
                   AS fh_survival_e6
        FROM steps
    """,
    tags=("statistics", "survival", "nelson-aalen", "events", "global-sort"),
)
def nelson_aalen_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for view->purchase conversion with
    right-censoring: H(t) = Σ_{t_i ≤ t} d_i/n_i over the same risk-set
    construction as `kaplan_meier_conversion` (pipeline54:24 — users who
    never purchase leave the risk set at corpus end). Each hazard
    increment is the EXACT half-up integer ratio int_ratio(d, n_risk, 6)
    — the cumulative path is a window sum of int64s over a total order,
    with no floating point until the display-only Fleming-Harrington
    survival exp(−H).

    Scale design: identical to KM — one user-keyed conditional-min
    aggregate, then windows on the |distinct event hours| rollup; at
    100 TB the hour pre-bucketing bounds that relation, nothing else
    changes."""
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
    w_prev = Window.orderBy(F.asc("t_hours")).rowsBetween(Window.unboundedPreceding, -1)
    risk = ev.crossJoin(F.broadcast(n_all)).select(
        "t_hours",
        F.col("d").cast("bigint").alias("d"),
        (F.col("n0") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0)))
        .cast("bigint")
        .alias("n_risk"),
    )
    steps = risk.where(F.col("d") > 0).select(
        "t_hours", "n_risk", "d", int_ratio(F.col("d"), F.col("n_risk"), 6).alias("hq")
    )
    w_cum = Window.orderBy(F.asc("t_hours")).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("hq").over(w_cum).cast("bigint")
    return steps.select(
        "t_hours",
        "n_risk",
        "d",
        cum.alias("cumhaz_e6"),
        grid(F.exp(-cum.cast("double") / 1000000.0), 6).alias("fh_survival_e6"),
    )
