"""TPC-H-style depth, batch 2: Q7, Q10, Q13, Q17, Q19 shapes.
(Q2/Q8/Q9/Q11/Q12/Q15/Q16/Q20/Q21/Q22 live in tpch_rest.py, adapted to
the driver schema; SURVEY.md §6 notes the reference itself has no
benchmark suite.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table, scaled_broadcast


from multithreaded_map_reduce_library_spark.functions.grid import (  # noqa: E402
    grid,
    gsum,
    int_ratio_big,
)


@register(
    "q7_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(CAST(FLOOR(volume * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                          JOIN orders   ON o_orderkey = l_orderkey
                          JOIN customer ON c_custkey = o_custkey
                          JOIN nation n1 ON s_nationkey = n1.n_nationkey
                          JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral trade volume between two nations. The
    disjunctive nation pair predicate applies after broadcast dimension
    joins; only lineitem⋈orders shuffles."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    sd = s.join(F.broadcast(n1), s.s_nationkey == n1.nk1).select("s_suppkey", "supp_nation")
    cd = c.join(F.broadcast(n2), c.c_nationkey == n2.nk2).select("c_custkey", "cust_nation")
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sd), l.l_suppkey == sd.s_suppkey)
        .join(F.broadcast(cd), o.o_custkey == cd.c_custkey)
        .filter(pair_ok)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(gsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue_e4"))
    )


@register(
    "q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
               CAST(FLOOR(c_acctbal * 10000.0 + 0.5) AS BIGINT) AS acctbal_e4, n_name
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue_e4 DESC, c_custkey ASC
        LIMIT 20
    """,
    tags=("join", "tpch", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by returned-item revenue in a
    quarter. Date filter pushed to orders scan, returnflag to lineitem
    scan; TakeOrderedAndProject for the cut."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(scaled_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(gsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue_e4"))
        .select(
            "c_custkey",
            "c_name",
            "revenue_e4",
            grid(F.col("c_acctbal"), 4).alias("acctbal_e4"),
            "n_name",
        )
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    tags=("join", "tpch", "outer", "double-agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of per-customer order counts — outer
    join with an extra join-side predicate, then a second aggregation over
    the first's result (the histogram-of-groups shape)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT CAST((SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) // 7) * 100
                    + ((SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) % 7) * 100 + 3) // 7
                    AS BIGINT) AS avg_yearly_e4
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    tags=("join", "tpch", "correlated-subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: correlated average-quantity subquery, decorrelated
    the scale-correct way — pre-aggregate avg(l_quantity) per partkey once
    and join it back, instead of a per-row subquery rescan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    avg_q = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        l.join(scaled_broadcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
        .join(avg_q, l.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(int_ratio_big(gsum(F.col("l_extendedprice"), 2), F.lit(7), 2).alias("avg_yearly_e4"))
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
        SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 21)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("join", "tpch", "disjunction"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: OR-of-conjunctions across both join sides.
    Catalyst extracts the common join key and pushes the per-side
    implied filters (brand IN (...), quantity range) below the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(scaled_broadcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return j.filter(c1 | c2 | c3).agg(
        gsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue_e4"),
        F.count("*").alias("n_items"),
    )
