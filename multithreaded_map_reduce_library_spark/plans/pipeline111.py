"""Pipeline batch 111 (round 4): DEPENDENCE MEASURES — mutual
information and Kendall's τ-b, completing the association family
(chi², Cramér-von Mises, Spearman, Mann-Whitney are already
registered):

* ``mutual_information_type_weekday`` — exact plug-in mutual
  information between event_type and weekday from the integer
  contingency table, each cell's term (n_xy/N)·ln(n_xy·N/(n_x·n_y))
  e9-grid-quantized BEFORE the (≤ 35-term) sum — the KM-logs
  discipline (pipeline54) — plus both marginal entropies and the
  normalized MI = MI/min(Hx,Hy) as a pure integer ratio of the
  quantized sums.
* ``kendall_tau_daily`` — Kendall's τ-b between daily event count and
  daily purchase revenue: all-pairs concordant/discordant/tie counts
  as exact integers over the |distinct days| self-join (bounded by the
  calendar, not the corpus), with the tie-corrected denominator in
  double of exact ints.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no statistics tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

# 0-based epoch-day weekday (the registry's convention for cross-engine
# weekday parity — DuckDB dayofweek is 0-based Sunday, Spark 1-based).
_DUCK_WD = "(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7)"


@register(
    "mutual_information_type_weekday",
    oracle=f"""
        WITH pts AS (
            SELECT event_type AS x, {_DUCK_WD} AS y FROM events
        ),
        n_all AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
        jd AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS nxy FROM pts GROUP BY x, y
        ),
        mx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS nx FROM pts GROUP BY x),
        my AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS ny FROM pts GROUP BY y),
        mi_terms AS (
            SELECT CAST(FLOOR(
                (CAST(nxy AS DOUBLE) / n)
                * ln(CAST(nxy AS DOUBLE) * n / (CAST(nx AS DOUBLE) * ny))
                * 1000000000.0 + 0.5) AS BIGINT) AS t
            FROM jd JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n_all
        ),
        hx_terms AS (
            SELECT CAST(FLOOR(
                -(CAST(nx AS DOUBLE) / n) * ln(CAST(nx AS DOUBLE) / n)
                * 1000000000.0 + 0.5) AS BIGINT) AS t
            FROM mx CROSS JOIN n_all
        ),
        hy_terms AS (
            SELECT CAST(FLOOR(
                -(CAST(ny AS DOUBLE) / n) * ln(CAST(ny AS DOUBLE) / n)
                * 1000000000.0 + 0.5) AS BIGINT) AS t
            FROM my CROSS JOIN n_all
        ),
        sums AS (
            SELECT (SELECT CAST(SUM(t) AS BIGINT) FROM mi_terms) AS mi,
                   (SELECT CAST(SUM(t) AS BIGINT) FROM hx_terms) AS hx,
                   (SELECT CAST(SUM(t) AS BIGINT) FROM hy_terms) AS hy,
                   (SELECT n FROM n_all) AS n
        )
        SELECT n AS n_events, mi AS mi_e9, hx AS hx_e9, hy AS hy_e9,
               CAST((mi * 1000000 + LEAST(hx, hy) // 2) // LEAST(hx, hy)
                    AS BIGINT) AS nmi_e6
        FROM sums
    """,
    tags=("statistics", "mutual-information", "dependence", "events"),
)
def mutual_information_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plug-in mutual information (nats) between event_type and the
    0-based epoch weekday: every contingency cell's term is built from
    exact integer counts, e9-quantized, and summed over the ≤ 5×7
    cells; marginal entropies get the same treatment and the
    normalized MI = MI/min(Hx,Hy) is a half-up integer ratio of the
    quantized sums — no unquantized float crosses an aggregation.

    Scale design: the contingency table is one map-side-combined
    groupBy bounded by |types|×7; marginals come from the same rollup.
    This is the feature-selection MI primitive (rank features by NMI
    against a label) in its exact, auditable form."""
    ev = load_table(spark, sf_dir, "events")
    wd = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) % 7
    ).alias("y")
    pts = ev.select(F.col("event_type").alias("x"), wd)
    n_all = pts.agg(F.count("*").cast("bigint").alias("n"))
    jd = pts.groupBy("x", "y").agg(F.count("*").cast("bigint").alias("nxy"))
    mx = pts.groupBy("x").agg(F.count("*").cast("bigint").alias("nx"))
    my = pts.groupBy("y").agg(F.count("*").cast("bigint").alias("ny"))
    nd = F.col("n").cast("double")
    mi_t = F.floor(
        (F.col("nxy").cast("double") / nd)
        * F.log(
            F.col("nxy").cast("double") * F.col("n")
            / (F.col("nx").cast("double") * F.col("ny"))
        )
        * 1e9
        + F.lit(0.5)
    ).cast("bigint")
    mi = (
        jd.join(mx, "x")
        .join(my, "y")
        .crossJoin(F.broadcast(n_all))
        .select(mi_t.alias("t"))
        .agg(F.sum("t").cast("bigint").alias("mi"))
    )
    ent = lambda cnt: F.floor(  # noqa: E731
        -(F.col(cnt).cast("double") / nd) * F.log(F.col(cnt).cast("double") / nd) * 1e9
        + F.lit(0.5)
    ).cast("bigint")
    hx = (
        mx.crossJoin(F.broadcast(n_all))
        .select(ent("nx").alias("t"))
        .agg(F.sum("t").cast("bigint").alias("hx"))
    )
    hy = (
        my.crossJoin(F.broadcast(n_all))
        .select(ent("ny").alias("t"))
        .agg(F.sum("t").cast("bigint").alias("hy"))
    )
    hmin = F.least(F.col("hx"), F.col("hy"))
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(n_all))
        .select(
            F.col("n").alias("n_events"),
            F.col("mi").alias("mi_e9"),
            F.col("hx").alias("hx_e9"),
            F.col("hy").alias("hy_e9"),
            F.call_function(
                "div",
                F.col("mi") * 1000000
                + F.call_function("div", hmin, F.lit(2).cast("bigint")),
                hmin,
            )
            .cast("bigint")
            .alias("nmi_e6"),
        )
    )


@register(
    "kendall_tau_daily",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS ec,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS rev
            FROM events GROUP BY 1
        ),
        pairs AS (
            SELECT CAST(SUM(CASE WHEN (a.ec - b.ec) * (a.rev - b.rev) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN (a.ec - b.ec) * (a.rev - b.rev) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS d,
                   CAST(SUM(CASE WHEN a.ec = b.ec AND a.rev <> b.rev
                             THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                   CAST(SUM(CASE WHEN a.rev = b.rev AND a.ec <> b.ec
                             THEN 1 ELSE 0 END) AS BIGINT) AS ty,
                   CAST(SUM(CASE WHEN a.ec = b.ec AND a.rev = b.rev
                             THEN 1 ELSE 0 END) AS BIGINT) AS txy,
                   CAST(COUNT(*) AS BIGINT) AS n0
            FROM daily a JOIN daily b ON a.day < b.day
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
        SELECT n_days, c AS concordant, d AS discordant,
               tx AS ties_x, ty AS ties_y, txy AS ties_both,
               CAST(FLOOR(
                   CAST(c - d AS DOUBLE)
                   / sqrt(CAST(n0 - tx - txy AS DOUBLE) * (n0 - ty - txy))
                   * 1000000.0 + 0.5) AS BIGINT) AS tau_b_e6
        FROM pairs CROSS JOIN nn
    """,
    tags=("statistics", "kendall", "dependence", "events", "all-pairs-bounded"),
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between daily event count and daily purchase
    revenue (cents): concordant/discordant and tie counts are exact
    integers over the all-pairs self-join of the DAILY rollup (≤ 30
    rows here — bounded by the calendar, never the corpus), and the
    tie-corrected τ-b = (C−D)/√((n0−T_x)(n0−T_y)) is one double of
    exact ints on the e6 grid.

    Scale design: the only quadratic object is |days|², which the
    calendar bounds (a year of days is 66 k pairs — trivial); the
    daily rollup itself is one map-side-combined groupBy."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("ec"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("rev"),
        )
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("ec").alias("eca"), F.col("rev").alias("reva")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("ec").alias("ecb"), F.col("rev").alias("revb")
    )
    de = F.col("eca") - F.col("ecb")
    dr = F.col("reva") - F.col("revb")
    pairs = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(F.when(de * dr > 0, 1).otherwise(0)).cast("bigint").alias("c"),
            F.sum(F.when(de * dr < 0, 1).otherwise(0)).cast("bigint").alias("d"),
            F.sum(F.when((de == 0) & (dr != 0), 1).otherwise(0))
            .cast("bigint")
            .alias("tx"),
            F.sum(F.when((dr == 0) & (de != 0), 1).otherwise(0))
            .cast("bigint")
            .alias("ty"),
            F.sum(F.when((de == 0) & (dr == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("txy"),
            F.count("*").cast("bigint").alias("n0"),
        )
    )
    nn = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    tau = F.floor(
        (F.col("c") - F.col("d")).cast("double")
        / F.sqrt(
            (F.col("n0") - F.col("tx") - F.col("txy")).cast("double")
            * (F.col("n0") - F.col("ty") - F.col("txy"))
        )
        * 1000000.0
        + F.lit(0.5)
    ).cast("bigint")
    return pairs.crossJoin(F.broadcast(nn)).select(
        "n_days",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("tx").alias("ties_x"),
        F.col("ty").alias("ties_y"),
        F.col("txy").alias("ties_both"),
        tau.alias("tau_b_e6"),
    )
