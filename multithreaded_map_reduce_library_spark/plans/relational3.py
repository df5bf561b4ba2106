"""Relational breadth, batch 3: GROUPING SETS, analytic window functions
(lag/lead/first/last, ntile/percent_rank/cume_dist), ordered string
aggregation, scalar subqueries, and UNION ALL — rounding out the SQL
surface a reference user migrating real workloads would expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table, register_views


from multithreaded_map_reduce_library_spark.functions.grid import (  # noqa: E402
    grid,
    gsum,
)


@register(
    "grouping_sets_lineitem",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_e2
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets", "sql-api"),
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube): one Expand +
    single-shuffle aggregate, via the SQL surface."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_e2
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@register(
    "window_order_gaps",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(FLOOR((o_totalprice - LAG(o_totalprice) OVER w) * 100.0 + 0.5) AS BIGINT)  AS diff_prev_e2,
               CAST(FLOOR((LEAD(o_totalprice) OVER w - o_totalprice) * 100.0 + 0.5) AS BIGINT) AS diff_next_e2,
               CAST(FLOOR(FIRST_VALUE(o_totalprice) OVER w2 * 100.0 + 0.5) AS BIGINT)        AS first_price_e2,
               CAST(FLOOR(LAST_VALUE(o_totalprice) OVER w2 * 100.0 + 0.5) AS BIGINT)         AS last_price_e2
        FROM orders
        WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "lag-lead"),
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD/FIRST/LAST analytics per customer order history (full-frame
    for first/last; deterministic (date, orderkey) ordering). One shuffle
    on o_custkey serves all four window functions."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        grid(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("diff_prev_e2"),
        grid(F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2).alias("diff_next_e2"),
        grid(F.first("o_totalprice").over(w2), 2).alias("first_price_e2"),
        grid(F.last("o_totalprice").over(w2), 2).alias("last_price_e2"),
    )


@register(
    "window_rank_distribution",
    oracle="""
        SELECT o_orderkey,
               CAST(NTILE(4) OVER w AS BIGINT)      AS quartile,
               CAST(FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) AS BIGINT) AS pct_rank_e6,
               CAST(FLOOR(CUME_DIST() OVER w * 1000000.0 + 0.5) AS BIGINT)     AS cume_e6,
               CAST(DENSE_RANK() OVER ws AS BIGINT) AS status_rank
        FROM orders
        WINDOW w  AS (ORDER BY o_totalprice DESC, o_orderkey ASC),
               ws AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    tags=("window", "rank"),
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: ntile/percent_rank/cume_dist over a global ordering
    plus dense_rank per status. The global window is the one operator that
    genuinely serializes (single partition) — at 100 TB you'd pre-aggregate
    or bucket the domain first; kept here for SQL-surface completeness."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    ws = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        grid(F.percent_rank().over(w), 6).alias("pct_rank_e6"),
        grid(F.cume_dist().over(w), 6).alias("cume_e6"),
        F.dense_rank().over(ws).cast("bigint").alias("status_rank"),
    )


@register(
    "ordered_name_agg",
    oracle="""
        SELECT c_nationkey AS nationkey,
               string_agg(c_name, '|' ORDER BY c_name) AS names
        FROM customer
        WHERE c_acctbal > 9900
        GROUP BY c_nationkey
    """,
    tags=("agg", "collect", "ordered"),
)
def ordered_name_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: array_sort(collect_list) then join —
    deterministic regardless of partitioning (collect_list order is not,
    the sort makes it so)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names")
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
        SELECT o_orderstatus, COUNT(*) AS n_above
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
    """,
    tags=("subquery", "scalar", "sql-api"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (planned once, result broadcast into
    the filter): orders above the global average price."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql("""
        SELECT o_orderstatus, COUNT(*) AS n_above
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
    """)


@register(
    "grouped_pandas_top_docs",
    oracle="""
        SELECT source, doc_id, n_chars_int AS n_chars, rank FROM (
            SELECT source, doc_id, CAST(length(text) AS BIGINT) AS n_chars_int,
                   CAST(ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY length(text) DESC, doc_id ASC) AS BIGINT) AS rank
            FROM documents)
        WHERE rank <= 3
    """,
    tags=("udf", "applyInPandas", "grouped"),
)
def grouped_pandas_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom Python operator via applyInPandas: per source, the 3
    longest documents. Each group arrives as one Arrow-backed pandas frame
    — the modern form of the reference's Reducer-over-grouped-values
    contract (mapreduce.h:6,83). Ranking math is integer-only (length,
    doc_id), so the result is bit-exact against the SQL oracle."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.length("text").cast("bigint").alias("n_chars")
    )

    def top3(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(3)
        out = out.assign(rank=range(1, len(out) + 1))
        return out[["source", "doc_id", "n_chars", "rank"]]

    return docs.groupBy("source").applyInPandas(
        top3, "source string, doc_id bigint, n_chars bigint, rank bigint"
    )


@register(
    "full_outer_join_daily_activity",
    oracle="""
        SELECT COALESCE(p.d, c.d) AS day,
               COALESCE(p.n, 0) AS n_purchases,
               COALESCE(c.n, 0) AS n_clicks
        FROM (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n
              FROM events WHERE event_type = 'purchase' GROUP BY 1) p
        FULL OUTER JOIN
             (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n
              FROM events WHERE event_type = 'click' GROUP BY 1) c
          ON p.d = c.d
    """,
    tags=("join", "full-outer"),
)
def full_outer_join_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily aggregates (days present on either
    side survive; missing side coalesces to 0)."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day.alias("d_p"))
        .agg(F.count("*").alias("n_p"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy(day.alias("d_c"))
        .agg(F.count("*").alias("n_c"))
    )
    return p.join(c, p.d_p == c.d_c, "full_outer").select(
        F.coalesce("d_p", "d_c").alias("day"),
        F.coalesce("n_p", F.lit(0)).alias("n_purchases"),
        F.coalesce("n_c", F.lit(0)).alias("n_clicks"),
    )


@register(
    "array_funcs_order_quantities",
    oracle="""
        SELECT l_orderkey,
               array_to_string(list_sort(list(l_quantity)), ',') AS qty_sorted,
               CAST(len(list(l_quantity)) AS INTEGER)            AS n_items,
               CAST(FLOOR(list_aggregate(list(l_quantity), 'max') * 10000.0 + 0.5)
                    AS BIGINT) AS max_qty_e4,
               CAST(FLOOR(list_aggregate(list_transform(list_sort(list(l_quantity)),
                     q -> q * 2), 'min') * 10000.0 + 0.5) AS BIGINT) AS min_doubled_e4
        FROM lineitem
        WHERE l_orderkey < 200
        GROUP BY l_orderkey
    """,
    tags=("scalar-array", "agg"),
)
def array_funcs_order_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over grouped data: sort_array/collect_list,
    size, array_max, transform+array_min — rendered to deterministic
    scalars (collect_list order is made stable by the sort)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    qtys = F.sort_array(F.collect_list("l_quantity"))
    return l.groupBy("l_orderkey").agg(
        F.array_join(qtys, ",").alias("qty_sorted"),
        F.size(qtys).alias("n_items"),
        grid(F.array_max(qtys), 4).alias("max_qty_e4"),
        grid(F.array_min(F.transform(qtys, lambda q: q * 2)), 4).alias("min_doubled_e4"),
    )


@register(
    "string_funcs_part_names",
    oracle="""
        SELECT p_partkey,
               upper(trim(p_name))                         AS name_uc,
               lpad(CAST(p_size AS VARCHAR), 4, '0')       AS size_padded,
               replace(p_type, 'PROMO', 'P*')              AS type_repl,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
               split_part(p_brand, '#', 1)                 AS brand_prefix,
               CAST(length(p_name) AS INTEGER)             AS name_len
        FROM part
        WHERE p_partkey <= 500
    """,
    tags=("scalar-string",),
)
def string_funcs_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family: upper/trim, lpad, replace, global
    regexp_replace, substring_index (split_part), length."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper(F.trim("p_name")).alias("name_uc"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace("p_type", F.lit("PROMO"), F.lit("P*")).alias("type_repl"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.substring_index("p_brand", "#", 1).alias("brand_prefix"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "posexplode_leading_tokens",
    oracle=r"""
        WITH t AS (SELECT doc_id,
                          unnest(list_filter(string_split_regex(text, '[ \t\r\n]'),
                                 x -> x <> '')) AS tok,
                          generate_subscripts(list_filter(string_split_regex(text, '[ \t\r\n]'),
                                 x -> x <> ''), 1) - 1 AS pos
                   FROM documents)
        SELECT tok AS token, COUNT(*) AS n_docs
        FROM t WHERE pos < 2
        GROUP BY tok
        HAVING COUNT(*) >= 5
    """,
    tags=("scalar-array", "posexplode", "text"),
)
def posexplode_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (positional explode): distribution of the first two
    tokens across documents — position-aware flattening the plain explode
    can't express."""
    from multithreaded_map_reduce_library_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "token"))
    return (
        t.filter(F.col("pos") < 2)
        .groupBy("token")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 5)
    )


@register(
    "regexp_extract_all_props",
    oracle="""
        SELECT event_type,
               CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_numbers,
               CAST(SUM(list_aggregate(list_transform(regexp_extract_all(props, '[0-9]+'),
                    x -> CAST(x AS BIGINT)), 'sum')) AS BIGINT) AS sum_numbers
        FROM events
        GROUP BY event_type
    """,
    tags=("scalar-string", "regex"),
)
def regexp_extract_all_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all + array aggregation over the JSON-ish props
    payload: count and sum of every embedded integer per event type."""
    e = load_table(spark, sf_dir, "events")
    nums = F.regexp_extract_all("props", F.lit("[0-9]+"), 0)
    num_sum = F.aggregate(
        F.transform(nums, lambda x: x.cast("bigint")), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return e.groupBy("event_type").agg(
        F.sum(F.size(nums)).alias("n_numbers"),
        F.sum(num_sum).alias("sum_numbers"),
    )


@register(
    "moving_7day_revenue",
    oracle="""
        WITH d AS (SELECT o_orderpriority,
                          CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                          CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS day_rev_e2
                   FROM orders GROUP BY 1, 2)
        SELECT o_orderpriority, CAST(day AS TIMESTAMP) AS day,
               CAST(SUM(day_rev_e2) OVER (PARTITION BY o_orderpriority ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS rev_7d_e2
        FROM d
    """,
    tags=("window", "range-frame"),
)
def moving_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue via a RANGE window frame (value-based, unlike
    the ROWS frames elsewhere): gaps in the date axis are handled by the
    frame bounds, not row offsets. Ordering key is epoch-day so the range
    arithmetic is integral in both engines."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(gsum(F.col("o_totalprice"), 2).alias("day_rev_e2"))
    epoch_day = F.datediff("day", F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(epoch_day)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.sum("day_rev_e2").over(w).alias("rev_7d_e2"),
    )


@register(
    "inline_dim_weighted_revenue",
    oracle="""
        SELECT w.tier, COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * w.weight * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS weighted_rev_e4
        FROM orders o
        JOIN (VALUES ('1-URGENT', 'hot', 2.0), ('2-HIGH', 'hot', 1.5),
                     ('3-MEDIUM', 'warm', 1.0), ('4-NOT SPECIFIED', 'cold', 0.5),
                     ('5-LOW', 'cold', 0.25)) AS w(prio, tier, weight)
          ON o.o_orderpriority = w.prio
        GROUP BY w.tier
    """,
    tags=("join", "inline-values", "broadcast"),
)
def inline_dim_weighted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline literal dimension (createDataFrame ≙ VALUES) broadcast onto
    the fact table — the config-table join every pipeline ships without a
    warehouse round-trip."""
    o = load_table(spark, sf_dir, "orders")
    weights = spark.createDataFrame(
        [
            ("1-URGENT", "hot", 2.0),
            ("2-HIGH", "hot", 1.5),
            ("3-MEDIUM", "warm", 1.0),
            ("4-NOT SPECIFIED", "cold", 0.5),
            ("5-LOW", "cold", 0.25),
        ],
        ["prio", "tier", "weight"],
    )
    return (
        o.join(F.broadcast(weights), o.o_orderpriority == weights.prio)
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            gsum(F.col("o_totalprice") * F.col("weight"), 4).alias("weighted_rev_e4"),
        )
    )


@register(
    "union_all_party_names",
    oracle="""
        SELECT side, COUNT(*) AS n, MIN(name) AS first_name
        FROM (
            SELECT 'customer' AS side, c_name AS name FROM customer
            UNION ALL
            SELECT 'supplier' AS side, s_name AS name FROM supplier
        )
        GROUP BY side
    """,
    tags=("setop", "union-all"),
)
def union_all_party_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle on the union itself) of two
    heterogeneous sources projected to a common schema."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_name").alias("name")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_name").alias("name")
    )
    return (
        c.unionByName(s)
        .groupBy("side")
        .agg(F.count("*").alias("n"), F.min("name").alias("first_name"))
    )
