"""Pipeline batch 112 (round 4): ISOTONIC CALIBRATION + ECE — the
recalibration fit and the scalar calibration summary, completing the
calibration family (logreg_calibration_bins, brier_decomposition,
conformal_coverage_audit):

* ``isotonic_calibration_fit`` — isotonic (monotone nondecreasing)
  regression of the empirical positive rate on the 11 forecast bins,
  via the EXACT minimax identity
  fitted_i = max_{j≤i} min_{k≥i} rate(j..k) — no PAVA iteration, no
  floats: interval rates are half-up integer ratios of prefix-sum
  differences, and the max-min runs over the ≤ 66 (j,k) intervals a
  triangle join of the 11-bin rollup produces. This is sklearn's
  IsotonicRegression as a deterministic SQL-replayable query.
* ``expected_calibration_error`` — ECE = Σ_k (n_k/N)·|f̄_k − ō_k|
  folds to the PURE integer ratio Σ_k |k·n_k − 10·p_k| / (10N) for
  this forecast family (f̄_k = k/10 exactly), plus the max bin gap
  (MCE) — both exact, no grid error at all in ECE.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no calibration tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DUCK_K = "LEAST((len(text) - len(replace(text, ' the ', ''))) // 5, 10)"

_DUCK_BINS = f"""
        pts AS (
            SELECT CAST({_DUCK_K} AS BIGINT) AS k,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS o
            FROM documents
        ),
        bins AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(o) AS BIGINT) AS pk
            FROM pts GROUP BY k
        )
"""


def _spark_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.least(
        F.floor(
            (F.length(F.col("text")) - F.length(F.replace(F.col("text"), F.lit(" the "))))
            / F.lit(5)
        ).cast("bigint"),
        F.lit(10).cast("bigint"),
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(k.alias("k"), F.when(F.col("lang") == "en", 1).otherwise(0).alias("o"))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("nk"), F.sum("o").cast("bigint").alias("pk"))
    )


@register(
    "isotonic_calibration_fit",
    oracle=f"""
        WITH {_DUCK_BINS},
        pre AS (
            SELECT k, nk, pk,
                   CAST(SUM(nk) OVER (ORDER BY k) AS BIGINT) AS cn,
                   CAST(SUM(pk) OVER (ORDER BY k) AS BIGINT) AS cp
            FROM bins
        ),
        ivals AS (
            -- rate of every contiguous bin interval [j..k], e9 half-up
            SELECT j.k AS jb, kk.k AS kb,
                   {duck_int_ratio("kk.cp - j.cp + j.pk", "kk.cn - j.cn + j.nk", 9)}
                       AS r
            FROM pre j JOIN pre kk ON j.k <= kk.k
        ),
        inner_min AS (
            -- for each (i, j<=i): min over k>=i of rate(j..k)
            SELECT b.k AS i, iv.jb, MIN(iv.r) AS m
            FROM bins b JOIN ivals iv ON iv.jb <= b.k AND iv.kb >= b.k
            GROUP BY b.k, iv.jb
        ),
        fit AS (SELECT i AS k, CAST(MAX(m) AS BIGINT) AS fitted_e9
                FROM inner_min GROUP BY i)
        SELECT bins.k, bins.nk AS n_k, bins.pk AS pos_k,
               {duck_int_ratio("bins.pk", "bins.nk", 9)} AS rate_e9,
               fit.fitted_e9
        FROM bins JOIN fit USING (k)
        ORDER BY bins.k
    """,
    tags=("ml", "calibration", "isotonic", "documents"),
)
def isotonic_calibration_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression of the per-bin empirical positive rate via
    the minimax identity fitted_i = max_{j≤i} min_{k≥i} rate(j..k):
    interval rates are exact half-up e9 integer ratios of prefix-sum
    differences, so the fit is deterministic and bit-identical across
    engines — PAVA's result without PAVA's sequential pooling loop (the
    minimax form is embarrassingly parallel over intervals). Emits each
    bin's raw rate and the monotone fitted rate (the invariant test
    asserts monotonicity and agreement with a PAVA replay).

    Scale design: everything after the one corpus scan runs on the
    11-bin rollup (66 intervals, 11 output rows) — the fit cost is in
    the bins, not the corpus, exactly like real recalibration."""
    bins = _spark_bins(spark, sf_dir)
    wp = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "k",
        "nk",
        "pk",
        F.sum("nk").over(wp).cast("bigint").alias("cn"),
        F.sum("pk").over(wp).cast("bigint").alias("cp"),
    )
    j = pre.select(
        F.col("k").alias("jb"),
        F.col("nk").alias("jnk"),
        F.col("pk").alias("jpk"),
        F.col("cn").alias("jcn"),
        F.col("cp").alias("jcp"),
    )
    kk = pre.select(
        F.col("k").alias("kb"), F.col("cn").alias("kcn"), F.col("cp").alias("kcp")
    )
    ivals = j.join(kk, F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        int_ratio(
            F.col("kcp") - F.col("jcp") + F.col("jpk"),
            F.col("kcn") - F.col("jcn") + F.col("jnk"),
            9,
        ).alias("r"),
    )
    inner_min = (
        bins.select(F.col("k").alias("i"))
        .join(ivals, (F.col("jb") <= F.col("i")) & (F.col("kb") >= F.col("i")))
        .groupBy("i", "jb")
        .agg(F.min("r").alias("m"))
    )
    fit = inner_min.groupBy("i").agg(F.max("m").cast("bigint").alias("fitted_e9"))
    return (
        bins.join(fit, bins["k"] == fit["i"])
        .select(
            "k",
            F.col("nk").alias("n_k"),
            F.col("pk").alias("pos_k"),
            int_ratio(F.col("pk"), F.col("nk"), 9).alias("rate_e9"),
            "fitted_e9",
        )
        .orderBy("k")
    )


@register(
    "expected_calibration_error",
    oracle=f"""
        WITH {_DUCK_BINS},
        tot AS (SELECT CAST(SUM(nk) AS BIGINT) AS n FROM bins),
        gaps AS (
            SELECT nk, ABS(k * nk - 10 * pk) AS g,
                   {duck_int_ratio("ABS(k * nk - 10 * pk)", "10 * nk", 9)} AS bin_gap_e9
            FROM bins
        )
        SELECT tot.n AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               {duck_int_ratio("SUM(g)", "10 * tot.n", 9)} AS ece_e9,
               CAST(MAX(bin_gap_e9) AS BIGINT) AS mce_e9
        FROM gaps CROSS JOIN tot
        GROUP BY tot.n
    """,
    tags=("ml", "calibration", "ece", "documents"),
)
def expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected and maximum calibration error of the ' the '-count
    forecast: with f̄_k = k/10 exact, ECE = Σ_k (n_k/N)|f̄_k − ō_k|
    folds to the single exact integer ratio Σ|k·n_k − 10·p_k| / (10N)
    — zero quantization anywhere — and MCE is the max per-bin e9 gap.
    The one-number companions to `brier_decomposition`'s REL term and
    the input `isotonic_calibration_fit` repairs.

    Scale design: one corpus scan to the 11-bin rollup; the rest is
    arithmetic on 11 rows."""
    bins = _spark_bins(spark, sf_dir)
    tot = bins.agg(F.sum("nk").cast("bigint").alias("n"))
    g = F.abs(F.col("k") * F.col("nk") - 10 * F.col("pk"))
    gaps = bins.select(
        "nk",
        g.alias("g"),
        int_ratio(g, 10 * F.col("nk"), 9).alias("bin_gap_e9"),
    )
    return (
        gaps.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.count("*").cast("bigint").alias("n_bins"),
            F.sum("g").cast("bigint").alias("sg"),
            F.max("bin_gap_e9").cast("bigint").alias("mce_e9"),
        )
        .select(
            F.col("n").alias("n_docs"),
            "n_bins",
            int_ratio(F.col("sg"), 10 * F.col("n"), 9).alias("ece_e9"),
            "mce_e9",
        )
    )
