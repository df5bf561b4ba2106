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

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


def _r4(c):
    return F.round(c, 4)


# --------------------------------------------------------------------------
# TPC-H-style shapes
# --------------------------------------------------------------------------


@register(
    "q6_revenue_forecast",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
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
            _r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
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
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-02-01'
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
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(_r4(100.0 * F.sum(promo_rev) / F.sum(rev)).alias("promo_pct"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               ROUND(SUM(l_quantity), 4) AS total_qty
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
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(_r4(F.sum("l_quantity")).alias("total_qty"))
    )


# --------------------------------------------------------------------------
# CUBE / pivot / statistics
# --------------------------------------------------------------------------


@register(
    "cube_part_brand_size",
    oracle="""
        SELECT p_brand, p_type, COUNT(*) AS n_parts,
               ROUND(AVG(p_retailprice), 4) AS avg_price
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
        F.count("*").alias("n_parts"), _r4(F.avg("p_retailprice")).alias("avg_price")
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
               ROUND(quantile_cont(l_quantity, 0.5), 4)  AS p50_qty,
               ROUND(quantile_cont(l_quantity, 0.9), 4)  AS p90_qty,
               ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
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
        _r4(F.percentile("l_quantity", F.lit(0.5))).alias("p50_qty"),
        _r4(F.percentile("l_quantity", F.lit(0.9))).alias("p90_qty"),
        _r4(F.percentile("l_extendedprice", F.lit(0.99))).alias("p99_price"),
    )


@register(
    "stats_price_quantity",
    oracle="""
        SELECT l_linestatus,
               ROUND(stddev_samp(l_quantity), 4)                    AS sd_qty,
               ROUND(var_samp(l_extendedprice), 4)                  AS var_price,
               ROUND(corr(l_quantity, l_extendedprice), 4)          AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4)    AS cov_qty_price
        FROM lineitem
        GROUP BY l_linestatus
    """,
    tags=("agg", "stats"),
)
def stats_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion + association statistics (stddev/variance/corr/covar) —
    single-pass partial-aggregable moments."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        _r4(F.stddev_samp("l_quantity")).alias("sd_qty"),
        _r4(F.var_samp("l_extendedprice")).alias("var_price"),
        _r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        _r4(F.covar_samp("l_quantity", "l_extendedprice")).alias("cov_qty_price"),
    )


@register(
    "sql_revenue_by_region",
    oracle="""
        SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               ROUND(SUM(o_totalprice), 4) AS revenue
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
               ROUND(SUM(o_totalprice), 4) AS revenue
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
