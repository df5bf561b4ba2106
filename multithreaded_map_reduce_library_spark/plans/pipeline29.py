"""Pipeline batch 29: regression, changepoint, and inequality
statistics — all three computed with EXACT INTEGER arithmetic (normal
equations / scaled partial sums / rank-weighted sums over
grid-quantized values), so every aggregate is BIGINT
order-invariant and the only doubles are final display divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "ols_user_trend",
    oracle="""
        WITH e AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS y_q
            FROM events
        ),
        m AS (SELECT user_id, MIN(day) AS d0 FROM e GROUP BY user_id),
        x AS (
            SELECT e.user_id, (e.day - m.d0) AS x, e.y_q
            FROM e JOIN m ON e.user_id = m.user_id
        ),
        s AS (
            SELECT user_id, COUNT(*) AS n,
                   SUM(x) AS sx, SUM(y_q) AS sy,
                   SUM(x * y_q) AS sxy, SUM(x * x) AS sxx
            FROM x GROUP BY user_id
        )
        SELECT user_id, n,
               CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / 1000000.0 * 1000000.0 + 0.5) AS BIGINT)
                   AS slope_e6
        FROM s WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
    """,
    tags=("statistics", "regression", "trend", "events"),
)
def ols_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope of event value over days — the least-squares
    twin of ``theil_sen_user_trend`` (run both: where they disagree,
    outlier days are moving the OLS line). Normal equations on
    grid-quantized integers: n*Sxy - Sx*Sy over n*Sxx - Sx^2, both
    BIGINT-exact (x is days since the user's first event, <=30, so no
    overflow anywhere near int64).

    Scale design: ONE user-keyed aggregate of five integer sums
    (map-side combined) after a min-day join that co-locates under
    user_id bucketing. No windows, no per-user iteration — this is the
    textbook 'regression as sufficient statistics' layout that scales
    to any group count.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint").alias("y_q"),
    )
    m = e.groupBy("user_id").agg(F.min("day").alias("d0"))
    x = e.join(m, "user_id").select(
        "user_id", F.datediff("day", "d0").cast("bigint").alias("x"), "y_q"
    )
    s = x.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y_q").alias("sy"),
        F.sum(F.col("x") * F.col("y_q")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    n_d = F.col("n").cast("double")
    num_d = n_d * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    den_d = n_d * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    return s.where(den_d > 0).select(
        "user_id",
        "n",
        grid(num_d / den_d / 1000000.0, 6).alias("slope_e6"),
    )


@register(
    "cusum_changepoint_daily",
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS v_q
            FROM events GROUP BY day
        ),
        g AS (SELECT COUNT(*) AS n, SUM(v_q) AS tot FROM d),
        c AS (
            SELECT day, v_q,
                   SUM(v_q) OVER (ORDER BY day ASC
                                  ROWS UNBOUNDED PRECEDING) AS pre,
                   ROW_NUMBER() OVER (ORDER BY day ASC) AS i
            FROM d
        ),
        s AS (
            SELECT c.day, g.n,
                   ABS(g.n * c.pre - c.i * g.tot) AS dev_scaled
            FROM c CROSS JOIN g
        )
        SELECT day AS change_day, n AS n_days,
               CAST(FLOOR(CAST(dev_scaled AS DOUBLE) / n / 1000000.0 * 1000000.0 + 0.5)
                    AS BIGINT) AS max_dev_e6
        FROM s ORDER BY dev_scaled DESC, change_day ASC LIMIT 1
    """,
    tags=("statistics", "changepoint", "cusum", "events", "global-sort"),
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily value series: the day
    maximizing |cumulative deviation from the global mean| — the
    classic 'when did the level shift' monitor. The deviation is kept
    SCALED-INTEGER (n*prefix_i - i*total — the mean never materializes
    as a float), so the argmax is over exact BIGINTs with a day
    tiebreak; the display value divides once at the end.

    Scale design: one day-keyed aggregate, a cumulative window over the
    |days| relation (bounded by the calendar, not by throughput), and a
    top-1. The shape every daily-metric changepoint job has.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint")).alias("v_q")
    )
    g = d.agg(F.count("*").alias("n"), F.sum("v_q").alias("tot"))
    wcum = Window.orderBy(F.asc("day")).rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "day",
        F.sum("v_q").over(wcum).alias("pre"),
        F.row_number().over(Window.orderBy(F.asc("day"))).alias("i"),
    )
    s = c.crossJoin(F.broadcast(g)).select(
        "day",
        "n",
        F.abs(F.col("n") * F.col("pre") - F.col("i") * F.col("tot")).alias(
            "dev_scaled"
        ),
    )
    return (
        s.orderBy(F.desc("dev_scaled"), F.asc("day"))
        .limit(1)
        .select(
            F.col("day").alias("change_day"),
            F.col("n").alias("n_days"),
            grid(
                F.col("dev_scaled").cast("double") / F.col("n") / 1000000.0, 6
            ).alias("max_dev_e6"),
        )
    )


@register(
    "gini_revenue_concentration",
    oracle="""
        WITH r AS (
            SELECT o_custkey,
                   SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_q
            FROM orders GROUP BY o_custkey
        ),
        k AS (
            SELECT rev_q,
                   ROW_NUMBER() OVER (ORDER BY rev_q ASC, o_custkey ASC) AS i
            FROM r
        ),
        g AS (
            SELECT COUNT(*) AS n, SUM(rev_q) AS tot,
                   SUM(i * rev_q) AS wsum
            FROM k
        )
        SELECT n AS n_customers, CAST(tot AS BIGINT) AS total_rev_q,
               CAST(FLOOR((2.0 * CAST(wsum AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(tot AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS gini_e6
        FROM g
    """,
    tags=("analytics", "inequality", "gini", "orders", "global-sort"),
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the single-number
    complement of ``orders_pareto_concentration``: 0 = revenue spread
    evenly, 1 = one customer is the business. Computed from the
    rank-weighted sum formula G = (2*Σi*y_i - (n+1)*Σy) / (n*Σy) on
    cent-grid integers with a custkey rank tiebreak — every aggregate
    BIGINT-exact, one display division.

    Scale design: a customer-keyed revenue aggregate, one global rank
    over the |customers| relation (range-partitioned sort), and a
    3-integer rollup. At 100 TB the rank would ride the equi-depth
    histogram of rev_q; the formula is unchanged.
    """
    orders = load_table(spark, sf_dir, "orders")
    r = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")).alias(
            "rev_q"
        )
    )
    k = r.select(
        "rev_q",
        F.row_number()
        .over(Window.orderBy(F.asc("rev_q"), F.asc("o_custkey")))
        .alias("i"),
    )
    g = k.agg(
        F.count("*").alias("n"),
        F.sum("rev_q").alias("tot"),
        F.sum(F.col("i") * F.col("rev_q")).alias("wsum"),
    )
    # Products in DOUBLE from the exact integer aggregates (n*tot-style
    # BIGINT products overflow at 100x scale; doubles-from-exact-ints are
    # identical in both engines — grid rule).
    return g.select(
        F.col("n").alias("n_customers"),
        F.col("tot").alias("total_rev_q"),
        grid(
            (
                2.0 * F.col("wsum").cast("double")
                - (F.col("n").cast("double") + 1.0) * F.col("tot").cast("double")
            )
            / (F.col("n").cast("double") * F.col("tot").cast("double")),
            6,
        ).alias("gini_e6"),
    )
