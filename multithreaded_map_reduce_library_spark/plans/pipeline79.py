"""Pipeline batch 79 (round 4): t-CLOSENESS AUDIT + PAGE-HINKLEY DRIFT —
the third privacy gate and a sequential drift detector for pipeline
monitoring.

* ``t_closeness_audit`` — completes the k-anonymity / l-diversity
  governance tier (pipeline67): for each quasi-identifier class the Earth
  Mover's Distance between the class's ordered sensitive-value
  distribution and the corpus-wide one, computed as EXACT integer
  cumulative-count arithmetic (EMD over an ordered attribute with unit
  ground distance = mean |ΔCDF|). A class leaks when its distribution is
  too far from global (t = 0.2, the threshold from the original
  t-closeness paper's examples).
* ``page_hinkley_drift`` — the classic one-sided sequential drift test on
  the daily revenue series: PH_t = M_t − min_{i≤t} M_i where M_t is the
  cumulative deviation from the series mean. Distinct from
  ``cusum_changepoint_daily`` (pipeline29): CUSUM there locates the
  single best split by max |S_t|; Page-Hinkley is the ONLINE detector
  with a running-minimum reset that flags every day the drift statistic
  exceeds λ. All arithmetic is integers (cents, scaled by n_days so the
  fractional mean never materializes).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
statistics tier; both queries extend the driver-mandated superset.
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

_N_BUCKETS = 10  # ordered sensitive-value buckets: LEAST(9, FLOOR(value/20))
_T_E6 = 200_000  # t = 0.2 on the e6 grid


@register(
    "t_closeness_audit",
    oracle=f"""
        WITH base AS (
            SELECT event_type,
                   CAST(LEAST({_N_BUCKETS - 1}, FLOOR(value / 20.0)) AS BIGINT) AS sbucket
            FROM events
            WHERE value IS NOT NULL
        ),
        cls AS (
            SELECT event_type, sbucket, COUNT(*) AS nc FROM base GROUP BY 1, 2
        ),
        gl AS (
            SELECT sbucket, COUNT(*) AS ng FROM base GROUP BY 1
        ),
        tot AS (
            SELECT SUM(ng) AS n_total FROM gl
        ),
        ctot AS (
            SELECT event_type, SUM(nc) AS n_class FROM cls GROUP BY 1
        ),
        grid AS (
            SELECT c.event_type, CAST(gs.b AS BIGINT) AS sbucket,
                   COALESCE(x.nc, 0) AS nc, COALESCE(g.ng, 0) AS ng
            FROM ctot c
            CROSS JOIN generate_series(0, 9) AS gs(b)
            LEFT JOIN cls x ON x.event_type = c.event_type AND x.sbucket = gs.b
            LEFT JOIN gl g ON g.sbucket = gs.b
        ),
        cum AS (
            SELECT event_type, sbucket,
                   CAST(SUM(nc) OVER (PARTITION BY event_type ORDER BY sbucket) AS BIGINT) AS cum_c,
                   CAST(SUM(ng) OVER (PARTITION BY event_type ORDER BY sbucket) AS BIGINT) AS cum_g
            FROM grid
        ),
        emd AS (
            SELECT m.event_type,
                   t.n_class,
                   CAST(SUM(ABS(m.cum_c * (SELECT n_total FROM tot)
                                - m.cum_g * t.n_class)) AS BIGINT) AS num
            FROM cum m JOIN ctot t USING (event_type)
            WHERE m.sbucket < {_N_BUCKETS - 1}
            GROUP BY m.event_type, t.n_class
        )
        SELECT event_type,
               CAST(n_class AS BIGINT) AS n_class,
               {duck_int_ratio_big('num', f'n_class * (SELECT n_total FROM tot) * {_N_BUCKETS - 1}', 6)} AS emd_e6,
               {duck_int_ratio_big('num', f'n_class * (SELECT n_total FROM tot) * {_N_BUCKETS - 1}', 6)} <= {_T_E6} AS t_ok
        FROM emd
    """,
    tags=("privacy", "governance", "t-closeness", "events", "audit"),
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the event table: quasi-identifier class =
    event_type, ordered sensitive attribute = the value decile bucket
    LEAST(9, FLOOR(value/20)). EMD between the class and global bucket
    distributions (ordered attribute, unit ground distance) is the mean
    absolute CDF gap — computed as exact integer cumulative counts
    cross-multiplied (|cum_c·N − cum_g·n_class|), so no float ever
    enters the hashed output; emd_e6 is the overflow-safe quotient/
    remainder grid. Classes with emd > t = 0.2 fail the release gate —
    the distribution-level leak k-anonymity and l-diversity
    (pipeline67) cannot see.

    Scale design: two aggregates over the fact scan (class×bucket,
    bucket) then arithmetic on a classes×buckets grid — the grid is
    |event_type|×10 rows, so the windows and the final join are over a
    relation thousands of times smaller than the input; the only
    fact-sized shuffle is the first groupBy. The 1-row total is a
    grand-aggregate broadcast (BNLJ-exempt shape)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.least(
            F.lit(_N_BUCKETS - 1), F.floor(F.col("value") / 20.0)
        )
        .cast("bigint")
        .alias("sbucket"),
    )
    cls = base.groupBy("event_type", "sbucket").agg(F.count("*").alias("nc"))
    glob = base.groupBy("sbucket").agg(F.count("*").alias("ng"))
    tot = glob.agg(F.sum("ng").cast("bigint").alias("n_total"))
    ctot = cls.groupBy("event_type").agg(F.sum("nc").cast("bigint").alias("n_class"))
    grid_df = (
        ctot.select(
            "event_type",
            "n_class",
            F.explode(
                F.array(*[F.lit(i).cast("bigint") for i in range(_N_BUCKETS)])
            ).alias("sbucket"),
        )
        .join(cls, ["event_type", "sbucket"], "left")
        .join(glob, ["sbucket"], "left")
        .select(
            "event_type",
            "sbucket",
            "n_class",
            F.coalesce(F.col("nc"), F.lit(0)).alias("nc"),
            F.coalesce(F.col("ng"), F.lit(0)).alias("ng"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("sbucket")
    cum = grid_df.select(
        "event_type",
        "sbucket",
        "n_class",
        F.sum("nc").over(w).cast("bigint").alias("cum_c"),
        F.sum("ng").over(w).cast("bigint").alias("cum_g"),
    )
    emd = (
        cum.where(F.col("sbucket") < _N_BUCKETS - 1)
        .crossJoin(F.broadcast(tot))  # 1-row grand aggregate (BNLJ-exempt)
        .groupBy("event_type", "n_class", "n_total")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_c") * F.col("n_total")
                    - F.col("cum_g") * F.col("n_class")
                )
            )
            .cast("bigint")
            .alias("num")
        )
    )
    den = F.col("n_class") * F.col("n_total") * F.lit(_N_BUCKETS - 1)
    ratio = int_ratio_big(F.col("num"), den, 6)
    return emd.select(
        "event_type",
        F.col("n_class").cast("bigint").alias("n_class"),
        ratio.alias("emd_e6"),
        (ratio <= F.lit(_T_E6)).alias("t_ok"),
    )


_PH_LAMBDA_PCT = 10  # alarm when PH exceeds 10% of one mean day's revenue


@register(
    "page_hinkley_drift",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(cents) AS BIGINT) AS total, COUNT(*) AS n_days FROM daily
        ),
        m AS (
            SELECT day, cents,
                   CAST(SUM(cents * (SELECT n_days FROM tot)
                            - (SELECT total FROM tot))
                        OVER (ORDER BY day) AS BIGINT) AS m_scaled
            FROM daily
        ),
        ph AS (
            SELECT day, cents, m_scaled,
                   m_scaled - MIN(m_scaled) OVER (ORDER BY day) AS ph_scaled
            FROM m
        )
        SELECT day, cents, m_scaled,
               CAST(ph_scaled AS BIGINT) AS ph_scaled,
               ph_scaled * 100 > (SELECT total FROM tot) * %(lam)d AS drift_alarm
        FROM ph
    """
    % {"lam": _PH_LAMBDA_PCT},
    tags=("statistics", "drift", "page-hinkley", "events", "global-sort"),
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift detection on daily purchase revenue:
    M_t = Σ_{i≤t}(x_i − mean) tracked against its running minimum;
    PH_t = M_t − min M flags every day the upward drift since the last
    trough exceeds λ = 10% of one mean day's revenue. Unlike the CUSUM
    changepoint query (which retrospectively locates the best single
    split), this is the online monitor a pipeline runs to catch value
    drift as data lands. Integer-exact: cents per day, deviations scaled
    by n_days so the fractional mean never appears, λ compared via
    cross-multiplication.

    Scale design: the fact-sized work is one groupBy(day); the PH
    recursion collapses to cumulative-sum minus running-min — two frames
    of ONE window over the day-level rollup (hundreds of rows), so the
    SinglePartition sort is over the tiny aggregate, never the fact
    table (the cusum/holt/haar precedent)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = daily.agg(
        F.sum("cents").cast("bigint").alias("total"), F.count("*").alias("n_days")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    m = (
        daily.crossJoin(F.broadcast(tot))  # 1-row grand aggregate (BNLJ-exempt)
        .select(
            "day",
            "cents",
            "total",
            F.sum(F.col("cents") * F.col("n_days") - F.col("total"))
            .over(w)
            .cast("bigint")
            .alias("m_scaled"),
        )
    )
    ph = m.select(
        "day",
        "cents",
        "m_scaled",
        (F.col("m_scaled") - F.min("m_scaled").over(w)).cast("bigint").alias(
            "ph_scaled"
        ),
        (
            (F.col("m_scaled") - F.min("m_scaled").over(w)) * 100
            > F.col("total") * F.lit(_PH_LAMBDA_PCT)
        ).alias("drift_alarm"),
    )
    return ph.select("day", "cents", "m_scaled", "ph_scaled", "drift_alarm")
