"""Relational operator breadth (SURVEY.md §2.2 "Spark plan" column) over the
driver's star schema: filters, projections, joins (broadcast/shuffle/semi/
anti), aggregation, windows, sorts/top-k, set ops, rollup, scalar functions.

The reference has none of these (§2.2 audit: single-input dataflow only);
they are the built-in relational capabilities the engine exposes so a
reference user gets a full query surface. Every query here is pure
DataFrame API — Catalyst handles pushdown, pruning, join strategy, and
partial aggregation; AQE re-plans at runtime.

Float policy (round-3 revision, VERDICT r2 items 1/3): displayed
aggregates of doubles are quantized PER ITEM onto an integer grid
(functions/grid.py gsum/gavg — exact BIGINT arithmetic in both engines,
suffix _e{k} records the 10^k scale) instead of ROUND(SUM(double), k),
whose value depends on summation order and whose decimal-tie handling
differs between engines. Raw (unaggregated) doubles pass through
bit-exact and are not rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    gavg,
    grid,
    gsum,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table, scaled_broadcast


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_e2,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_e6,
               CAST((SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) * 100 + COUNT(l_quantity) // 2) // COUNT(l_quantity) AS BIGINT) AS avg_qty_e4,
               CAST((SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) * 100 + COUNT(l_extendedprice) // 2) // COUNT(l_extendedprice) AS BIGINT) AS avg_price_e4,
               CAST((SUM(CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) * 100 + COUNT(l_discount) // 2) // COUNT(l_discount) AS BIGINT) AS avg_disc_e4,
               COUNT(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-filter-aggregate. Catalyst emits
    partial HashAggregate before the shuffle (the combiner the reference
    lacks, SURVEY.md §4) and pushes the shipdate filter to the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            gsum(F.col("l_quantity"), 2).alias("sum_qty_e2"),
            gsum(F.col("l_extendedprice"), 2).alias("sum_base_price_e2"),
            gsum(disc_price, 4).alias("sum_disc_price_e4"),
            gsum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge_e6"),
            gavg(F.col("l_quantity"), 2).alias("avg_qty_e4"),
            gavg(F.col("l_extendedprice"), 2).alias("avg_price_e4"),
            gavg(F.col("l_discount"), 2).alias("avg_disc_e4"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_orders_by_status",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*)                      AS count_order,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_total_e2,
               CAST((SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) * 100 + COUNT(o_totalprice) // 2) // COUNT(o_totalprice) AS BIGINT) AS avg_total_e4,
               MIN(o_orderdate)              AS min_date,
               MAX(o_orderdate)              AS max_date
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate group-by incl. MIN/MAX over timestamps."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("count_order"),
        gsum(F.col("o_totalprice"), 2).alias("sum_total_e2"),
        gavg(F.col("o_totalprice"), 2).alias("avg_total_e4"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


@register(
    "having_nations_by_customers",
    oracle="""
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        FROM customer
        GROUP BY c_nationkey
        HAVING COUNT(*) > 40
    """,
    tags=("agg", "having"),
)
def having_nations_by_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("n_customers") > 40)
    )


@register(
    "rollup_returns",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_e2
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (grand total + per-flag + per-pair)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), gsum(F.col("l_quantity"), 2).alias("sum_qty_e2")
    )


@register(
    "distinct_users_per_event_type",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "distinct"),
)
def distinct_users_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase aggregate."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Filter / projection / scalar functions
# --------------------------------------------------------------------------


@register(
    "filter_project_part",
    oracle="""
        SELECT p_partkey, p_name,
               UPPER(p_brand)                              AS brand_uc,
               CONCAT(p_type, '/', CAST(p_size AS VARCHAR)) AS type_size,
               CAST(FLOOR(p_retailprice * 1.1 * 10000.0 + 0.5) AS BIGINT) AS price_with_tax_e4
        FROM part
        WHERE p_size >= 25 AND p_type = 'PROMO'
    """,
    tags=("filter", "project", "scalar-string"),
)
def filter_project_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection + string scalar functions; both the p_size and
    p_type predicates push down to the parquet scan (PushedFilters)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter((F.col("p_size") >= 25) & (F.col("p_type") == "PROMO")).select(
        "p_partkey",
        "p_name",
        F.upper("p_brand").alias("brand_uc"),
        F.concat(F.col("p_type"), F.lit("/"), F.col("p_size").cast("string")).alias("type_size"),
        grid(F.col("p_retailprice") * 1.1, 4).alias("price_with_tax_e4"),
    )


@register(
    "case_when_order_buckets",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               COUNT(*) AS n_orders,
               CAST((SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) * 100 + COUNT(o_totalprice) // 2) // COUNT(o_totalprice) AS BIGINT) AS avg_price_e4
        FROM orders
        GROUP BY 1
    """,
    tags=("scalar", "case"),
)
def case_when_order_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregate."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"), gavg(F.col("o_totalprice"), 2).alias("avg_price_e4")
    )


@register(
    "date_parts_orders",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER)  AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               COUNT(*)                            AS n_orders
        FROM orders
        GROUP BY 1, 2
    """,
    tags=("scalar-date",),
)
def date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("o_year"), F.month("o_orderdate").alias("o_month")
    ).agg(F.count("*").alias("n_orders"))


@register(
    "json_props_events",
    oracle="""
        SELECT event_type,
               CAST((SUM(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) * 10000 + COUNT(CAST(regexp_extract(props, '[0-9]+') AS INTEGER)) // 2) // COUNT(CAST(regexp_extract(props, '[0-9]+') AS INTEGER)) AS BIGINT) AS avg_k_e4
        FROM events
        GROUP BY event_type
    """,
    tags=("scalar-json",),
)
def json_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        int_ratio(F.sum(k), F.count(k), 4).alias("avg_k_e4")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_e4 DESC, l_orderkey ASC
        LIMIT 10
    """,
    tags=("join", "tpch", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dimension filter -> fact joins -> agg ->
    top-k. customer is tiny relative to lineitem: Catalyst broadcasts it;
    the date filters push into both scans before the join."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(scaled_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(gsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue_e4"))
        .select("l_orderkey", "revenue_e4", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_e4"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    tags=("join", "tpch", "multi-join"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style six-table join. All dimensions (region, nation,
    supplier, customer) broadcast; only the orders-lineitem join shuffles —
    at 100 TB that's the single unavoidable shuffle, keyed on orderkey."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(scaled_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(scaled_broadcast(dims, sf_dir, "supplier"), (l.l_suppkey == dims.s_suppkey) & (c.c_nationkey == dims.s_nationkey))
        .groupBy("n_name")
        .agg(gsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue_e4"))
    )


@register(
    "join_customer_region",
    oracle="""
        SELECT r_name, COUNT(*) AS n_customers,
               CAST((SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) * 100 + COUNT(c_acctbal) // 2) // COUNT(c_acctbal) AS BIGINT) AS avg_acctbal_e4
        FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("join", "broadcast"),
)
def join_customer_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dimension join, both hops broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), gavg(F.col("c_acctbal"), 2).alias("avg_acctbal_e4"))
    )


@register(
    "semi_join_customers_with_urgent_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join", "semi"),
)
def semi_join_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): no row multiplication, right side only probed."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "outer_join_nation_supplier_counts",
    oracle="""
        SELECT n_name, COUNT(s_suppkey) AS n_suppliers
        FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    tags=("join", "outer"),
)
def outer_join_nation_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving empty nations (COUNT(col) skips nulls)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


# --------------------------------------------------------------------------
# Windows / sorts / set ops
# --------------------------------------------------------------------------


@register(
    "window_top_orders_per_customer",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
            FROM orders)
        WHERE rn <= 3
    """,
    tags=("window",),
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via ROW_NUMBER (deterministic tie-break on orderkey).
    Spark pushes a per-partition rank limit below the shuffle (WindowGroupLimit)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@register(
    "running_revenue_by_nation",
    oracle="""
        SELECT n_name, o_month, month_rev_e2,
               CAST(SUM(month_rev_e2) OVER (PARTITION BY n_name ORDER BY o_month
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_e2
        FROM (
            SELECT n_name, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS month_rev_e2
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2)
    """,
    tags=("window", "running-sum"),
)
def running_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative monthly revenue per nation: agg then running-sum window."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(scaled_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("o_month"))
        .agg(gsum(F.col("o_totalprice"), 2).alias("month_rev_e2"))
    )
    w = Window.partitionBy("n_name").orderBy("o_month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "n_name", "o_month", "month_rev_e2",
        F.sum("month_rev_e2").over(w).alias("cum_rev_e2"),
    )


@register(
    "topk_orders_global",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    tags=("sort", "topk"),
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject, not a full sort — O(k) memory
    per partition regardless of table size."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    ).limit(100)


@register(
    "setop_nations_customers_minus_suppliers",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "except"),
)
def setop_nations_customers_minus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "setop_active_keys_union_intersect",
    oracle="""
        SELECT COUNT(*) AS n_union FROM (
            SELECT o_custkey AS k FROM orders UNION SELECT c_custkey AS k FROM customer)
    """,
    tags=("setop", "union"),
)
def setop_active_keys_union_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) cardinality."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.union(c).distinct().agg(F.count("*").alias("n_union"))


@register(
    "setop_intersect_buyers_suppliers_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "intersect"),
)
def setop_intersect_buyers_suppliers_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set intersection) — Catalyst plans it as a
    left-semi join after per-side distinct."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# --------------------------------------------------------------------------
# Event-stream batch analytics (the streaming variants live in streaming/)
# --------------------------------------------------------------------------


@register(
    "events_hourly_tumbling",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e2
        FROM events
        GROUP BY 1, 2
    """,
    tags=("events", "window-agg", "streaming-equivalent"),
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch twin of the Structured
    Streaming query in streaming/windows.py (identical grouping semantics)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), gsum(F.col("value"), 2).alias("sum_value_e2"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_e2",
        )
    )


@register(
    "events_sessionize",
    oracle="""
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                        WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1
                        ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM g GROUP BY user_id
    """,
    tags=("events", "sessionize", "window"),
    bench=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + conditional sum.
    One shuffle on user_id serves both the window and the final group-by
    (Catalyst reuses the partitioning)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Timestamp subtraction keeps full microsecond precision (casting to
    # long would truncate to seconds and disagree with the oracle at the
    # 30-minute boundary).
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL '30' MINUTE")), 1
    ).otherwise(0)
    return (
        e.select("user_id", new_sess.alias("new_sess"))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )
