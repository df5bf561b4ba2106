"""Pipeline batch 24: distribution-shift statistics and classic
warehouse segmentation — the monitoring tier of a corpus pipeline.

Exact-arithmetic discipline: both hypothesis-test statistics here are
computed as INTEGER cross-multiplications (c1*n2 - c2*n1 style), so the
max/sum state is BIGINT-exact and aggregation-order-invariant; the only
doubles are final display divisions of exactly-representable integers.
This is stronger than the 1e4-grid rule — these two statistics admit
exact rational forms, so we use them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "ks_test_value_drift",
    oracle="""
        WITH s AS (
            SELECT value,
                   CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15'
                        THEN 1 ELSE 2 END AS grp
            FROM events
        ),
        n AS (SELECT COUNT(*) FILTER (WHERE grp = 1) AS n1,
                     COUNT(*) FILTER (WHERE grp = 2) AS n2 FROM s),
        c AS (
            SELECT value,
                   COUNT(*) FILTER (WHERE grp = 1) AS c1,
                   COUNT(*) FILTER (WHERE grp = 2) AS c2
            FROM s GROUP BY value
        ),
        cum AS (
            SELECT value,
                   SUM(c1) OVER (ORDER BY value ASC
                                 ROWS UNBOUNDED PRECEDING) AS f1,
                   SUM(c2) OVER (ORDER BY value ASC
                                 ROWS UNBOUNDED PRECEDING) AS f2
            FROM c
        )
        SELECT n.n1, n.n2,
               CAST(MAX(ABS(f1 * n.n2 - f2 * n.n1)) AS BIGINT) AS d_num,
               CAST(MAX(ABS(f1 * n.n2 - f2 * n.n1)) AS DOUBLE)
                   / (CAST(n.n1 AS DOUBLE) * n.n2) AS d_stat
        FROM cum CROSS JOIN n
        GROUP BY n.n1, n.n2
    """,
    tags=("drift", "statistics", "ks-test", "events", "global-sort"),
)
def ks_test_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the event-value
    distribution of the first two weeks and the rest — the standard
    "did the upstream data shift" monitor. D = max |F1(x) - F2(x)| is
    computed as the EXACT integer max |cum1*n2 - cum2*n1| over the
    pooled support, divided once at the end — no float comparisons
    inside the scan, so the statistic is bit-stable by construction.

    Scale design: one value-keyed count aggregate (map-side combined),
    then a cumulative window over the DISTINCT-value relation — the
    window input is |support| rows, not |events| rows. For a truly
    unbounded support you'd pre-bucket values (equi-depth histogram
    query) and run the same integer max over bucket boundaries; the
    plan shape is unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "value",
        F.when(F.to_date("ts") < F.lit("2024-01-15").cast("date"), 1)
        .otherwise(2)
        .alias("grp"),
    )
    n = s.agg(
        F.count(F.when(F.col("grp") == 1, 1)).alias("n1"),
        F.count(F.when(F.col("grp") == 2, 1)).alias("n2"),
    )
    c = s.groupBy("value").agg(
        F.count(F.when(F.col("grp") == 1, 1)).alias("c1"),
        F.count(F.when(F.col("grp") == 2, 1)).alias("c2"),
    )
    w = Window.orderBy(F.asc("value")).rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        "value",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    d = (
        cum.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(
            F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))).alias(
                "d_num"
            )
        )
    )
    return d.select(
        "n1",
        "n2",
        "d_num",
        (
            F.col("d_num").cast("double")
            / (F.col("n1").cast("double") * F.col("n2"))
        ).alias("d_stat"),
    )


@register(
    "mann_whitney_click_view",
    oracle="""
        WITH s AS (
            SELECT value, event_type FROM events
            WHERE event_type IN ('click', 'view')
        ),
        r AS (
            SELECT value, event_type,
                   -- average rank over ties as an exact multiple of 0.5:
                   -- (2*min_rank + ties - 1) / 2
                   CAST(2 * RANK() OVER (ORDER BY value ASC)
                        + COUNT(*) OVER (PARTITION BY value) - 1 AS DOUBLE) / 2
                       AS avg_rank
            FROM s
        ),
        agg AS (
            SELECT COUNT(*) FILTER (WHERE event_type = 'click') AS n1,
                   COUNT(*) FILTER (WHERE event_type = 'view') AS n2,
                   SUM(CASE WHEN event_type = 'click'
                            THEN CAST(2 * avg_rank AS BIGINT) ELSE 0 END) AS r1_x2
            FROM r
        )
        SELECT n1, n2,
               CAST(r1_x2 AS DOUBLE) / 2
                   - CAST(n1 AS DOUBLE) * (n1 + 1) / 2 AS u_stat,
               (CAST(r1_x2 AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)
                   / (CAST(n1 AS DOUBLE) * n2) AS auc
        FROM agg
    """,
    tags=("statistics", "rank-test", "events", "global-sort"),
)
def mann_whitney_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U comparing click vs view event values — the
    nonparametric "is one population stochastically larger" test; the
    normalized U is exactly the AUC of value as a click-vs-view
    classifier. Tie-averaged ranks are carried as 2*rank (an integer),
    so the rank sum is BIGINT-exact and order-invariant; doubles appear
    only in the two final display divisions.

    Scale design: one global rank — a range-partitioned sort (Spark's
    window over a global order) on the filtered relation, then a single
    4-integer aggregate. At 100 TB the same statistic would ride the
    equi-depth histogram instead of per-row ranks; shape unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("click", "view")).select(
        "value", "event_type"
    )
    r = s.select(
        "event_type",
        (
            (
                2 * F.rank().over(Window.orderBy(F.asc("value")))
                + F.count("*").over(Window.partitionBy("value"))
                - 1
            ).cast("double")
            / 2
        ).alias("avg_rank"),
    )
    agg = r.agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n1"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n2"),
        F.sum(
            F.when(
                F.col("event_type") == "click",
                (2 * F.col("avg_rank")).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("r1_x2"),
    )
    u = (
        F.col("r1_x2").cast("double") / 2
        - F.col("n1").cast("double") * (F.col("n1") + 1) / 2
    )
    return agg.select(
        "n1",
        "n2",
        u.alias("u_stat"),
        (u / (F.col("n1").cast("double") * F.col("n2"))).alias("auc"),
    )


@register(
    "cohort_retention_matrix",
    oracle="""
        WITH f AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        a AS (
            SELECT DISTINCT e.user_id, f.cohort_day,
                   CAST(ts AS DATE) - f.cohort_day AS day_offset
            FROM events e JOIN f ON e.user_id = f.user_id
        )
        SELECT cohort_day, day_offset, COUNT(*) AS n_active
        FROM a
        WHERE day_offset <= 7
        GROUP BY cohort_day, day_offset
    """,
    tags=("analytics", "cohort", "retention", "events"),
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-seen day, and
    for offsets 0..7 the count of cohort members active that many days
    later — the triangle matrix behind every retention chart.

    Scale design: first-seen day is one user-keyed MIN aggregate; the
    activity join is user-keyed (co-located if events are bucketed by
    user_id); the distinct collapses (user, offset) duplicates
    map-side before the skinny (cohort, offset) count. Pure integers.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    a = (
        ev.join(f, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        a.where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "rfm_segmentation",
    oracle="""
        WITH p AS (
            SELECT user_id,
                   MAX(CAST(ts AS DATE)) AS last_day,
                   COUNT(*) AS freq,
                   SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS mon_q
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        mx AS (SELECT MAX(last_day) AS asof FROM p),
        s AS (
            SELECT user_id,
                   mx.asof - last_day AS recency_days,
                   freq, mon_q
            FROM p CROSS JOIN mx
        ),
        q AS (
            SELECT user_id,
                   NTILE(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS r_q,
                   NTILE(4) OVER (ORDER BY freq DESC, user_id ASC) AS f_q,
                   NTILE(4) OVER (ORDER BY mon_q DESC, user_id ASC) AS m_q
            FROM s
        )
        SELECT r_q, f_q, m_q, COUNT(*) AS n_users
        FROM q GROUP BY r_q, f_q, m_q
    """,
    tags=("analytics", "segmentation", "rfm", "events", "ntile"),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation over
    purchasers — the warehouse segmentation classic. Monetary sums ride
    the 1e6 integer grid; every NTILE order carries user_id as the
    deterministic tiebreak, so quartile boundaries cannot drift between
    runs or engines.

    Scale design: one purchase aggregate per user, then three global
    NTILE windows over the |users| relation (range-partitioned sorts on
    an already-aggregated input), and a 64-cell rollup. The windows are
    the only global orders and they run on user-grain data, not events.
    """
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count("*").alias("freq"),
            F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint")).alias(
                "mon_q"
            ),
        )
    )
    mx = p.agg(F.max("last_day").alias("asof"))
    s = p.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.datediff(F.col("asof"), F.col("last_day")).alias("recency_days"),
        "freq",
        "mon_q",
    )
    q = s.select(
        "user_id",
        F.ntile(4)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("user_id")))
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("freq"), F.asc("user_id")))
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("mon_q"), F.asc("user_id")))
        .alias("m_q"),
    )
    return q.groupBy("r_q", "f_q", "m_q").agg(F.count("*").alias("n_users"))
