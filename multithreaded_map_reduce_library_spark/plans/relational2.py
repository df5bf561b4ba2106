"""Relational breadth, batch 2: TPC-H-style Q4/Q6/Q14/Q18 shapes, CUBE,
pivot, exact percentiles, dispersion statistics, as-of join, and a bounded
range join — all pure DataFrame API with DuckDB oracle twins.

The as-of and range joins are the two "operators Spark lacks" from the
driver's custom-operator list; both are implemented as compositions of
built-in ops chosen for their 100 TB plan shape (single shuffle on the
equi-key; no unbounded theta join), per the strategy in SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    gavg,
    grid,
    gsum,
    int_ratio_big,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table, scaled_broadcast


# --------------------------------------------------------------------------
# TPC-H-style shapes
# --------------------------------------------------------------------------


@register(
    "q6_revenue_forecast",
    oracle="""
        SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("agg", "tpch", "pushdown"),
    bench=True,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter+aggregate, the pushdown showcase — all
    four predicates reach the parquet scan (PushedFilters), the scan reads
    only 4 of 16 lineitem columns (ReadSchema), and no shuffle carries more
    than one partial-agg row per task."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            gsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue_e4"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: correlated EXISTS with a non-key predicate, expressed
    as a LEFT SEMI join carrying the correlated condition — lineitem is
    probed, never multiplied."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
        SELECT CAST((pr * 100 // tr) * 10000
                    + ((pr * 100 % tr) * 10000 + tr // 2) // tr AS BIGINT) AS promo_pct_e4
        FROM (SELECT SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)
                         ELSE 0 END) AS pr,
                     SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS tr
              FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-02-01')
    """,
    tags=("join", "tpch", "conditional-agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share: date-pruned fact scan, broadcast
    dimension join, conditional aggregate."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev_e4 = F.floor(rev * 10000.0 + F.lit(0.5)).cast("bigint")
    promo_e4 = F.when(F.col("p_type") == "PROMO", rev_e4).otherwise(F.lit(0))
    # promo share of revenue in percent on a 1e-4 grid, exact integer
    # arithmetic end to end (int_ratio_big avoids the 10^6 blowup of the
    # scaled numerator).
    return (
        l.join(scaled_broadcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
        .agg(
            int_ratio_big(F.sum(promo_e4) * 100, F.sum(rev_e4), 4).alias(
                "promo_pct_e4"
            )
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_qty_e2
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    """,
    tags=("join", "tpch", "agg-semi"),
    bench=True,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: aggregate-then-semi-join. The HAVING pre-aggregate
    produces a tiny key set that LEFT SEMI joins back into the fact —
    lineitem is read once per side but the big join is keyed, never theta."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(scaled_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(gsum(F.col("l_quantity"), 2).alias("total_qty_e2"))
    )


# --------------------------------------------------------------------------
# CUBE / pivot / statistics
# --------------------------------------------------------------------------


@register(
    "cube_part_brand_size",
    oracle="""
        SELECT p_brand, p_type, COUNT(*) AS n_parts,
               CAST((SUM(CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT)) * 100
                     + COUNT(p_retailprice) // 2) // COUNT(p_retailprice) AS BIGINT) AS avg_price_e4
        FROM part
        GROUP BY CUBE (p_brand, p_type)
    """,
    tags=("agg", "cube"),
)
def cube_part_brand_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations in one pass (Catalyst expands
    to a single Expand + aggregate — one shuffle, not four)."""
    p = load_table(spark, sf_dir, "part")
    return p.cube("p_brand", "p_type").agg(
        F.count("*").alias("n_parts"), gavg(F.col("p_retailprice"), 2).alias("avg_price_e4")
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "pivot_priority_by_year",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {", ".join(
                   f'''COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS "{p}"'''
                   for p in _PRIORITIES
               )}
        FROM orders
        GROUP BY 1
    """,
    tags=("agg", "pivot"),
)
def pivot_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (explicit value list, so no extra distinct-values job): order
    counts per priority per year; absent combinations surface as 0."""
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    return pivoted.select(
        "o_year", *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(p) for p in _PRIORITIES]
    )


@register(
    "percentiles_lineitem",
    oracle="""
        SELECT l_returnflag,
               CAST(FLOOR(quantile_cont(l_quantity, 0.5) * 10000.0 + 0.5) AS BIGINT)  AS p50_qty_e4,
               CAST(FLOOR(quantile_cont(l_quantity, 0.9) * 10000.0 + 0.5) AS BIGINT)  AS p90_qty_e4,
               CAST(FLOOR(quantile_cont(l_extendedprice, 0.99) * 10000.0 + 0.5) AS BIGINT) AS p99_price_e4
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT semantics). The
    sketch alternative (approx_percentile/KLL) is the 100 TB path when
    exactness isn't contractual; exact is used here because the oracle
    hash-compares values."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        grid(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty_e4"),
        grid(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty_e4"),
        grid(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99_price_e4"),
    )


@register(
    "stats_price_quantity",
    oracle="""
        WITH q AS (SELECT l_linestatus,
                          CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS qv,
                          CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS pv
                   FROM lineitem),
        m AS (SELECT l_linestatus,
                     CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(CAST(SUM(qv) AS BIGINT) AS DOUBLE) AS sq,
                     CAST(CAST(SUM(pv) AS BIGINT) AS DOUBLE) AS sp,
                     CAST(CAST(SUM(qv*qv) AS BIGINT) AS DOUBLE) AS sq2,
                     CAST(CAST(SUM(pv*pv) AS BIGINT) AS DOUBLE) AS sp2,
                     CAST(CAST(SUM(qv*pv) AS BIGINT) AS DOUBLE) AS sqp
              FROM q GROUP BY l_linestatus)
        SELECT l_linestatus,
               CAST(FLOOR(sqrt((sq2 - sq*sq/n) / (n-1)) / 100.0 * 10000.0 + 0.5) AS BIGINT) AS sd_qty_e4,
               CAST(FLOOR((sp2 - sp*sp/n) / (n-1) / 10000.0 * 10000.0 + 0.5) AS BIGINT) AS var_price_e4,
               CAST(FLOOR((sqp - sq*sp/n) / (sqrt(sq2 - sq*sq/n) * sqrt(sp2 - sp*sp/n)) * 10000.0 + 0.5) AS BIGINT) AS corr_qty_price_e4,
               CAST(FLOOR((sqp - sq*sp/n) / (n-1) / 10000.0 * 10000.0 + 0.5) AS BIGINT) AS cov_qty_price_e4
        FROM m
    """,
    tags=("agg", "stats"),
)
def stats_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion + association statistics (stddev/variance/corr/covar) —
    single-pass partial-aggregable moments.

    Determinism (grid rule): the built-in STDDEV/VAR/CORR single-pass
    aggregates carry double partials whose low bits depend on merge
    order, and var_price's magnitude (~1e8) puts that noise ABOVE a 4dp
    rounding grid — so the moments are instead derived from exact
    integer-cent power sums (n, Σq, Σp, Σq², Σp², Σqp — BIGINT, one
    map-side-combined shuffle, same plan shape) and the identical IEEE
    double expression on both engines, displayed on the _e4 grid.
    BIGINT headroom: Σp² ≈ 2.5e13/item — fine to ~3e5 items/group;
    beyond that widen the squares to DECIMAL(38,0)."""
    l = load_table(spark, sf_dir, "lineitem")
    qv = F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5)).cast("bigint")
    pv = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    m = (
        l.select("l_linestatus", qv.alias("qv"), pv.alias("pv"))
        .groupBy("l_linestatus")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("qv").cast("double").alias("sq"),
            F.sum("pv").cast("double").alias("sp"),
            F.sum(F.col("qv") * F.col("qv")).cast("double").alias("sq2"),
            F.sum(F.col("pv") * F.col("pv")).cast("double").alias("sp2"),
            F.sum(F.col("qv") * F.col("pv")).cast("double").alias("sqp"),
        )
    )
    n, sq, sp = F.col("n"), F.col("sq"), F.col("sp")
    sq2, sp2, sqp = F.col("sq2"), F.col("sp2"), F.col("sqp")
    var_q_num = sq2 - sq * sq / n
    var_p_num = sp2 - sp * sp / n
    cov_num = sqp - sq * sp / n
    return m.select(
        "l_linestatus",
        grid(F.sqrt(var_q_num / (n - 1)) / 100.0, 4).alias("sd_qty_e4"),
        grid(var_p_num / (n - 1) / 10000.0, 4).alias("var_price_e4"),
        grid(cov_num / (F.sqrt(var_q_num) * F.sqrt(var_p_num)), 4).alias(
            "corr_qty_price_e4"
        ),
        grid(cov_num / (n - 1) / 10000.0, 4).alias("cov_qty_price_e4"),
    )


@register(
    "sql_revenue_by_region",
    oracle="""
        SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e2
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation   ON c_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, 2
    """,
    tags=("sql-api", "join", "agg"),
)
def sql_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() surface: identical logical plan to the DataFrame
    API (both compile to the same Catalyst tree), exercised through
    registered temp views so reference users can bring raw SQL."""
    from multithreaded_map_reduce_library_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ["orders", "customer", "nation", "region"])
    return spark.sql("""
        SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e2
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation   ON c_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, o_year
    """)


# --------------------------------------------------------------------------
# As-of join / range join (events)
# --------------------------------------------------------------------------


@register(
    "asof_purchase_last_click",
    oracle="""
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               c.ts AS last_click_ts, c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    tags=("join", "asof", "events"),
    bench=True,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (per purchase, the user's most recent click at or before
    it) via the union-sort plan: tag both sides, one shuffle on user_id, a
    running LAST(click) window — O(n log n) per user and NO range/theta
    join, which is what makes it survive 100 TB (a time-condition equi-join
    would rescan every click per purchase).

    Tie policy: a click at exactly purchase_ts counts (sort puts clicks
    first at equal ts), matching ASOF's `<=`.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_purchase")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_purchase")
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_ts = F.when(F.col("is_purchase") == 0, F.col("ts"))
    click_id = F.when(F.col("is_purchase") == 0, F.col("event_id"))
    return (
        unioned.select(
            "user_id",
            "ts",
            "event_id",
            "is_purchase",
            F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
            F.last(click_id, ignorenulls=True).over(w).alias("click_id"),
        )
        .filter(F.col("is_purchase") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
            "click_id",
        )
    )


@register(
    "range_join_close_events",
    oracle="""
        SELECT a.user_id, COUNT(*) AS n_pairs
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.event_id > a.event_id
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
         AND a.ts <= b.ts
        GROUP BY a.user_id
    """,
    tags=("join", "range", "events"),
)
def range_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join (event pairs of one user within 60 s, ordered by
    ts with event_id tie-break folded into the id inequality): implemented
    by bucketing time into 60 s grid cells and equi-joining each left row to
    its own and the next bucket — the O(n^2)-per-user theta join becomes a
    keyed join whose fan-out is the actual pair density.

    Note b.ts >= a.ts is required (not just event_id ordering) so each
    unordered pair is counted once with the earlier event as `a`; the
    oracle carries the same predicate.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    # ts is TIMESTAMP_NTZ; cast via the UTC session zone for unix_micros.
    bucket = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(60_000_000))
    a = e.select(
        "user_id",
        F.col("event_id").alias("id_a"),
        F.col("ts").alias("ts_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("b_key"),
    )
    b = e.select(
        "user_id",
        F.col("event_id").alias("id_b"),
        F.col("ts").alias("ts_b"),
        bucket.alias("b_key"),
    )
    pairs = a.join(b, ["user_id", "b_key"]).filter(
        (F.col("id_b") > F.col("id_a"))
        & (F.col("ts_b") >= F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL '60' SECOND"))
    )
    # The two probe buckets (k, k+1) are distinct, and each b row has one
    # bucket, so no pair can match twice — no dedup shuffle needed.
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))
