"""Pipeline batch 32: market-basket co-occurrence mining (support +
lift over parts bought in the same order) and time-to-conversion
quartiles (survival-analysis-lite over view→purchase delays). Pure
integer arithmetic; lift and quartiles use exact rational/rank forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_MB_MIN_SUPPORT = 3


@register(
    "market_basket_pairs",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
        item AS (SELECT l_partkey, COUNT(*) AS n_item FROM b GROUP BY l_partkey),
        p AS (
            SELECT a.l_partkey AS part_a, x.l_partkey AS part_b,
                   COUNT(*) AS support
            FROM b a JOIN b x
              ON a.l_orderkey = x.l_orderkey AND a.l_partkey < x.l_partkey
            GROUP BY part_a, part_b
        )
        SELECT p.part_a, p.part_b, p.support,
               CAST(FLOOR(CAST(p.support AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
                     / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE))
                     * 1000000.0 + 0.5) AS BIGINT) AS lift_e6
        FROM p
        JOIN item ia ON ia.l_partkey = p.part_a
        JOIN item ib ON ib.l_partkey = p.part_b
        CROSS JOIN n
        WHERE p.support >= {_MB_MIN_SUPPORT}
    """,
    tags=("analytics", "market-basket", "association", "lineitem"),
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: part pairs co-occurring in the
    same order, with support count and lift
    (P(a,b) / (P(a)P(b)) = support * n_orders / (n_a * n_b)) — the
    Apriori first pass / item-item collaborative-filtering primitive.
    Lift is a single division of exact integer products.

    Scale design: the pair space is generated per order (baskets are
    small — a handful of lines — so pairs-per-basket is bounded, the
    standard market-basket argument), keyed by l_orderkey which
    co-locates under the natural bucketing; the (part_a, part_b) count
    aggregate map-side combines; item counts broadcast. The support
    floor prunes the long tail before the lift join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = b.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    a = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    x = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    p = (
        a.join(x, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= _MB_MIN_SUPPORT)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb"))
    return (
        p.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            grid(
                F.col("support").cast("double") * F.col("n_orders").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("lift_e6"),
        )
    )


@register(
    "time_to_conversion_quartiles",
    oracle="""
        WITH f AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
            FROM events GROUP BY user_id
        ),
        d AS (
            SELECT user_id,
                   CAST(FLOOR(epoch(t_buy - t_view) / 3600) AS BIGINT) AS hours
            FROM f
            WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy > t_view
        ),
        c AS (SELECT COUNT(*) AS n_conv FROM d),
        cen AS (SELECT COUNT(*) AS n_censored FROM f
                WHERE t_view IS NOT NULL
                  AND (t_buy IS NULL OR t_buy <= t_view)),
        r AS (
            SELECT hours,
                   ROW_NUMBER() OVER (ORDER BY hours ASC, user_id ASC) AS rk
            FROM d
        )
        SELECT c.n_conv, cen.n_censored,
               (SELECT hours FROM r CROSS JOIN c WHERE rk = (c.n_conv + 3) // 4)
                   AS q1_hours,
               (SELECT hours FROM r CROSS JOIN c WHERE rk = (c.n_conv + 1) // 2)
                   AS median_hours,
               (SELECT hours FROM r CROSS JOIN c WHERE rk = (3 * c.n_conv + 3) // 4)
                   AS q3_hours
        FROM c CROSS JOIN cen
    """,
    tags=("analytics", "survival", "conversion", "events", "global-sort"),
)
def time_to_conversion_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: hours from a user's first view
    to their first purchase, reported as exact rank-selected quartiles
    (lower quantile — element ceil(p*n) of the sorted delays, no
    interpolated averaging) plus the censored count (viewed, never
    converted) — survival-analysis-lite for the funnel.

    Determinism: delays are integer hours; quartiles are rank picks
    with user_id tiebreaks in the rank order (ties in hours cannot
    change the picked VALUE).

    Scale design: one user-keyed conditional-min aggregate, then ranks
    over the |converted users| relation. The rank-select quartile is
    the exact-percentile pattern shared with median_quantity_by_flag.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    d = f.where(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") > F.col("t_view"))
    ).select(
        "user_id",
        F.floor(
            (F.unix_timestamp("t_buy") - F.unix_timestamp("t_view")) / 3600
        )
        .cast("bigint")
        .alias("hours"),
    )
    c = d.agg(F.count("*").alias("n_conv"))
    cen = f.where(
        F.col("t_view").isNotNull()
        & (F.col("t_buy").isNull() | (F.col("t_buy") <= F.col("t_view")))
    ).agg(F.count("*").alias("n_censored"))
    r = d.select(
        "hours",
        F.row_number()
        .over(Window.orderBy(F.asc("hours"), F.asc("user_id")))
        .alias("rk"),
    )

    def pick(expr, name):
        # grand MAX over the single matching rank row -> the broadcast
        # build side is structurally a one-row aggregate (audit rule)
        return (
            r.crossJoin(F.broadcast(c))
            .where(F.col("rk") == expr)
            .agg(F.max("hours").alias(name))
        )

    q1 = pick(((F.col("n_conv") + 3) / 4).cast("bigint"), "q1_hours")
    med = pick(((F.col("n_conv") + 1) / 2).cast("bigint"), "median_hours")
    q3 = pick(((3 * F.col("n_conv") + 3) / 4).cast("bigint"), "q3_hours")
    return (
        c.crossJoin(F.broadcast(cen))
        .crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(q3))
        .select("n_conv", "n_censored", "q1_hours", "median_hours", "q3_hours")
    )
