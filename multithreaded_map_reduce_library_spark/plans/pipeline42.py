"""Pipeline batch 42: sequence predictability (conditional entropy of
the event-type Markov chain), temporal autocorrelation of the daily
series (lags 1 and 7), and a churn-threshold sweep — closing the
behavioral-analytics tier.

Discipline: entropy contributions ride the 1e4 grid over integer
transition counts; autocorrelation uses exact-integer sufficient
statistics over the lag-joined daily grid values (the ols_user_trend
pattern); churn counts are pure integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "markov_conditional_entropy",
    oracle="""
        WITH s AS (
            SELECT user_id, event_type, ts, event_id,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC) AS nxt
            FROM events
        ),
        t AS (
            SELECT event_type AS cur, nxt, COUNT(*) AS c
            FROM s WHERE nxt IS NOT NULL
            GROUP BY cur, nxt
        ),
        rt AS (SELECT cur, SUM(c) AS rc FROM t GROUP BY cur),
        q AS (
            SELECT t.cur, t.c, rt.rc,
                   CAST(FLOOR(t.c * (ln(CAST(rt.rc AS DOUBLE) / t.c) / ln(2.0))
                              * 10000.0 + 0.5) AS BIGINT) AS bits_q
            FROM t JOIN rt USING (cur)
        )
        SELECT cur, CAST(MAX(rc) AS BIGINT) AS n_transitions,
               CAST(SUM(bits_q) AS DOUBLE) / CAST(MAX(rc) AS DOUBLE) / 10000.0
                   AS cond_entropy_bits
        FROM q GROUP BY cur
    """,
    tags=("statistics", "entropy", "markov", "events"),
)
def markov_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(next | current) per current event type —
    how predictable the next action is given the current one (0 bits =
    deterministic flows, log2(5) ~ 2.32 = uniformly random). The
    information-theoretic summary of `event_markov_transitions`'
    matrix, with contributions c*log2(rc/c) on the 1e4 grid summed as
    BIGINT (pipeline8 rule).

    Scale design: one user-keyed LEAD window (user-partitioned sort, no
    global order), a 25-cell transition count, and 5-row rollups.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    t = s.groupBy(F.col("event_type").alias("cur"), "nxt").agg(
        F.count("*").alias("c")
    )
    rt = t.groupBy("cur").agg(F.sum("c").alias("rc"))
    q = t.join(rt, "cur").select(
        "cur",
        "rc",
        F.floor(
            F.col("c")
            * (F.log(F.col("rc").cast("double") / F.col("c")) / F.log(F.lit(2.0)))
            * 10000.0
            + 0.5
        )
        .cast("bigint")
        .alias("bits_q"),
    )
    return q.groupBy("cur").agg(
        F.max("rc").alias("n_transitions"),
        (
            F.sum("bits_q").cast("double")
            / F.max("rc").cast("double")
            / 10000.0
        ).alias("cond_entropy_bits"),
    )


@register(
    "daily_autocorrelation",
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS v_q
            FROM events GROUP BY day
        ),
        lags AS (SELECT unnest([1, 7]) AS lag_days),
        p AS (
            SELECT l.lag_days, a.v_q AS x, b.v_q AS y
            FROM d a
            JOIN lags l ON TRUE
            JOIN d b ON b.day = a.day + l.lag_days
        ),
        s AS (
            SELECT lag_days, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM p GROUP BY lag_days
        )
        SELECT lag_days, n,
               CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * (CAST(n AS DOUBLE) * syy
                               - CAST(sy AS DOUBLE) * sy))
                     * 1000000.0 + 0.5) AS BIGINT) AS acf_e6
        FROM s
    """,
    tags=("time-series", "autocorrelation", "events"),
)
def daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily value total at lags 1 and 7 — the
    two numbers that say "is there day-to-day momentum" and "is there a
    weekly cycle" (read beside `weekday_seasonal_index`). The lag pairs
    come from a self-join on day+lag; correlations use exact-integer
    sufficient statistics with the y-moment factor in double (the
    simpsons_paradox_scan overflow rule).

    Scale design: the series is the |days| relation — the self-join,
    the stats, everything downstream is calendar-bounded; corpus work
    is one day aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")).alias("v_q")
    )
    a = d.select(F.col("day").alias("day_a"), F.col("v_q").alias("x"))
    b = d.select(F.col("day").alias("day_b"), F.col("v_q").alias("y"))
    # one equi-join per lag (unioned) — no lag-relation cross-join needed
    parts = []
    for k in (1, 7):
        parts.append(
            a.join(b, F.col("day_b") == F.date_add(F.col("day_a"), k)).select(
                F.lit(k).cast("int").alias("lag_days"), "x", "y"
            )
        )
    p = parts[0].unionAll(parts[1])
    s = p.groupBy("lag_days").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (
            F.col("n").cast("double") * F.col("syy")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    return s.select("lag_days", "n", grid(num / den, 6).alias("acf_e6"))


_CH_THRESHOLDS = (7, 14, 21)


def _churn_oracle() -> str:
    parts = []
    for k in _CH_THRESHOLDS:
        parts.append(f"""
        SELECT {k} AS inactive_days,
               COUNT(*) FILTER (
                   WHERE last_day < cutoff_day - {k}) AS n_churned,
               COUNT(*) AS n_users
        FROM (
            SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day,
                   (SELECT MAX(CAST(ts AS DATE)) FROM events) AS cutoff_day
            FROM events GROUP BY user_id
        )""")
    return " UNION ALL ".join(parts)


@register(
    "churn_threshold_sweep",
    oracle=_churn_oracle(),
    tags=("analytics", "churn", "sweep", "events"),
)
def churn_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-definition sweep: users whose last activity is more than
    7/14/21 days before the corpus's newest day — the sensitivity table
    behind picking a churn cutoff (the operating-point sweep pattern of
    `minhash_threshold_sweep` / `session_timeout_sweep`). Integers.

    Scale design: one user-keyed MAX aggregate plus a 1-row global max
    broadcast; the sweep re-reads the tiny per-user relation 3 times.
    """
    ev = load_table(spark, sf_dir, "events")
    last = ev.groupBy("user_id").agg(F.max(F.to_date("ts")).alias("last_day"))
    cutoff_day = ev.agg(F.max(F.to_date("ts")).alias("cutoff_day"))
    base = last.crossJoin(F.broadcast(cutoff_day))
    outs = []
    for k in _CH_THRESHOLDS:
        outs.append(
            base.agg(
                F.count(
                    F.when(F.col("last_day") < F.date_sub(F.col("cutoff_day"), k), 1)
                ).alias("n_churned"),
                F.count("*").alias("n_users"),
            ).select(
                F.lit(k).cast("int").alias("inactive_days"),
                "n_churned",
                "n_users",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
