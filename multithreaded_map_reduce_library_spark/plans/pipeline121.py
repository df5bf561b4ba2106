"""Pipeline batch 121 (round 4): LITTLE'S LAW CONSERVATION + NEGATIVE-
BINOMIAL FIT — an operational-analytics identity checked across two
DIFFERENT physical plans, and the overdispersed count model the
burstiness audit (event_burstiness_fano) motivates:

* ``littles_law_audit`` — sessionize (30-min gap rule, the registry's
  convention), then compute total occupied seconds TWICE: (a) the
  per-session aggregate Σ(end−start), and (b) the sweep-line integral
  of the concurrency step function (+1/−1 boundary deltas, ordered
  walk, Σ c_i·Δt). The two are algebraically equal — so the emitted
  ``conserved`` flag must be true, a cross-PLAN invariant (a bug in
  either the sessionizer or the sweep-line breaks it). On top, the
  Little's-law triple: L = occupancy/T, λ = sessions/hour,
  W = mean session seconds — with L = λ·W by construction.
* ``negbin_moment_fit`` — method-of-moments negative-binomial fit of
  per-user event counts: p̂ = m/v, r̂ = m²/(v−m) from exact integer
  moments (population variance), e6 grid, plus the overdispersion
  ratio v/m that justifies NB over Poisson.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no analytics tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import duck_int_ratio, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_GAP_S = 1800

_DUCK_SESSIONS = f"""
        ev AS (
            SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events
        ),
        marked AS (
            SELECT user_id, es,
                   CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY es)
                             > {_GAP_S}
                        OR LAG(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
                        THEN 1 ELSE 0 END AS brk
            FROM ev
        ),
        sess AS (
            SELECT user_id,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY es
                                  ROWS UNBOUNDED PRECEDING) AS sid,
                   es
            FROM marked
        ),
        spans AS (
            SELECT user_id, sid,
                   CAST(MIN(es) AS BIGINT) AS s, CAST(MAX(es) AS BIGINT) AS e
            FROM sess GROUP BY user_id, sid
        )
"""


@register(
    "littles_law_audit",
    oracle=f"""
        WITH {_DUCK_SESSIONS},
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(SUM(e - s) AS BIGINT) AS total_occupied_s,
                   CAST(MIN(s) AS BIGINT) AS t0, CAST(MAX(e) AS BIGINT) AS t1
            FROM spans
        ),
        bounds AS (
            SELECT s AS t, 1 AS delta FROM spans
            UNION ALL
            SELECT e AS t, -1 FROM spans
        ),
        walk AS (
            SELECT t,
                   CAST(SUM(delta) OVER (ORDER BY t, delta
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
                   LEAD(t) OVER (ORDER BY t, delta) AS t_next
            FROM bounds
        ),
        integral AS (
            SELECT CAST(SUM(c * (t_next - t)) AS BIGINT) AS sweep_occupied_s
            FROM walk WHERE t_next IS NOT NULL
        )
        SELECT agg.n_sessions, agg.total_occupied_s, integral.sweep_occupied_s,
               (agg.total_occupied_s = integral.sweep_occupied_s) AS conserved,
               {duck_int_ratio("agg.total_occupied_s", "agg.t1 - agg.t0", 6)}
                   AS avg_concurrency_e6,
               {duck_int_ratio("agg.n_sessions * 3600", "agg.t1 - agg.t0", 6)}
                   AS sessions_per_hour_e6,
               {duck_int_ratio("agg.total_occupied_s", "agg.n_sessions", 6)}
                   AS mean_session_s_e6
        FROM agg CROSS JOIN integral
    """,
    tags=("analytics", "littles-law", "sweep-line", "events", "global-sort"),
)
def littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law over 30-min-gap sessions, with the occupancy
    computed by two INDEPENDENT plans: the per-session Σ(end−start)
    aggregate and the sweep-line integral of the concurrency step
    function (boundary deltas ordered (t, delta) so closes precede
    opens at ties — both engines identically). The `conserved` flag
    asserts their exact equality — a cross-plan invariant that catches
    a bug in either the sessionizer or the sweep-line. L (avg
    concurrency), λ (sessions/hour), and W (mean session seconds)
    complete the operational triple with L = λ·W by construction.

    Scale design: sessionize is one user-keyed window; the sweep-line
    walks the 2·|sessions| boundary relation (skinny) — at 100 TB the
    walk partitions by day with boundary-offset composition like the
    registry's peak-concurrency query."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").cast("bigint").alias("es")
    )
    wlag = Window.partitionBy("user_id").orderBy("es")
    marked = ev.select(
        "user_id",
        "es",
        F.when(
            F.lag("es").over(wlag).isNull()
            | ((F.col("es") - F.lag("es").over(wlag)) > _GAP_S),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    wcum = Window.partitionBy("user_id").orderBy("es").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marked.select(
        "user_id", "es", F.sum("brk").over(wcum).alias("sid")
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.min("es").cast("bigint").alias("s"), F.max("es").cast("bigint").alias("e")
    )
    agg = spans.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("total_occupied_s"),
        F.min("s").cast("bigint").alias("t0"),
        F.max("e").cast("bigint").alias("t1"),
    )
    bounds = spans.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    wwalk = Window.orderBy("t", "delta")
    walk = bounds.select(
        "t",
        F.sum("delta")
        .over(wwalk.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("c"),
        F.lead("t").over(wwalk).alias("t_next"),
    )
    integral = walk.where(F.col("t_next").isNotNull()).agg(
        F.sum(F.col("c") * (F.col("t_next") - F.col("t")))
        .cast("bigint")
        .alias("sweep_occupied_s")
    )
    return agg.crossJoin(F.broadcast(integral)).select(
        "n_sessions",
        "total_occupied_s",
        "sweep_occupied_s",
        (F.col("total_occupied_s") == F.col("sweep_occupied_s")).alias("conserved"),
        int_ratio(F.col("total_occupied_s"), F.col("t1") - F.col("t0"), 6).alias(
            "avg_concurrency_e6"
        ),
        int_ratio(F.col("n_sessions") * 3600, F.col("t1") - F.col("t0"), 6).alias(
            "sessions_per_hour_e6"
        ),
        int_ratio(F.col("total_occupied_s"), F.col("n_sessions"), 6).alias(
            "mean_session_s_e6"
        ),
    )


@register(
    "negbin_moment_fit",
    oracle="""
        WITH cnts AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS sc,
                   CAST(SUM(c * c) AS BIGINT) AS scc
            FROM cnts
        )
        SELECT n AS n_users,
               CAST(FLOOR(CAST(sc AS DOUBLE) / n * 1000000.0 + 0.5) AS BIGINT)
                   AS mean_e6,
               CAST(FLOOR((CAST(scc AS DOUBLE) / n
                           - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n))
                          * 1000000.0 + 0.5) AS BIGINT) AS var_e6,
               CAST(FLOOR((CAST(scc AS DOUBLE) / n
                           - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n))
                          / (CAST(sc AS DOUBLE) / n) * 1000000.0 + 0.5) AS BIGINT)
                   AS overdispersion_e6,
               CAST(FLOOR((CAST(sc AS DOUBLE) / n)
                          / ((CAST(scc AS DOUBLE) / n
                              - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)))
                          * 1000000.0 + 0.5) AS BIGINT) AS p_hat_e6,
               CAST(FLOOR((CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)
                          / ((CAST(scc AS DOUBLE) / n
                              - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n))
                             - CAST(sc AS DOUBLE) / n)
                          * 1000000.0 + 0.5) AS BIGINT) AS r_hat_e6
        FROM mom
    """,
    tags=("statistics", "negative-binomial", "moments", "events"),
)
def negbin_moment_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments negative-binomial fit of per-user event
    counts: mean m and population variance v from exact integer
    moments, then p̂ = m/v and r̂ = m²/(v−m) — valid precisely because
    the counts are overdispersed (v/m > 1, also emitted). The count
    model a capacity planner fits where Poisson underestimates the
    tail; every double is the same expression of exact int64s in both
    engines, e6-gridded.

    Scale design: one user-keyed count rollup with map-side partials,
    one global moment row — the registry's two-level aggregation."""
    cnts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    mom = cnts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
    )
    m = F.col("sc").cast("double") / F.col("n")
    v = F.col("scc").cast("double") / F.col("n") - m * m
    g = lambda x: F.floor(x * 1000000.0 + F.lit(0.5)).cast("bigint")  # noqa: E731
    return mom.select(
        F.col("n").alias("n_users"),
        g(m).alias("mean_e6"),
        g(v).alias("var_e6"),
        g(v / m).alias("overdispersion_e6"),
        g(m / v).alias("p_hat_e6"),
        g(m * m / (v - m)).alias("r_hat_e6"),
    )
