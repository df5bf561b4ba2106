"""TPC-H-style depth, batch 3: the Q2/Q8/Q9/Q11/Q12/Q15/Q16/Q20/Q21/Q22
shapes, adapted to the driver schema (SURVEY.md §6: the reference ships no
benchmark suite, so these are capability-surface queries, not spec TPC-H).

Schema adaptations, applied identically in the Spark plan and the DuckDB
oracle so results stay hash-comparable:

- No ``partsupp`` table -> derive it from lineitem:
  ``ps(partkey, suppkey) = DISTINCT (l_partkey, l_suppkey)`` with
  ``ps_supplycost = MIN(l_extendedprice / l_quantity)`` (MIN is
  order-independent, so the double is bit-identical in both engines) and
  ``ps_availqty = SUM(l_quantity)`` (quantities are integral doubles, so
  the sum is exact and order-independent).
- No commit/receipt dates -> "late" means
  ``l_shipdate > o_orderdate + INTERVAL 90 DAYS``.
- No ``c_phone`` -> country code is ``c_nationkey``.

Scale notes are on each query; the general rules: dimension sides are
broadcast, the derived-partsupp aggregation is a single shuffle on
(partkey, suppkey) that AQE can coalesce, and threshold comparisons that
gate rows (Q11, Q20) are kept in exact arithmetic (decimal sums or
integral doubles) so a 1-ULP summation difference can never flip
membership — neither between engines nor between cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table, scaled_broadcast


from multithreaded_map_reduce_library_spark.functions.grid import (  # noqa: E402
    gsum,
    int_ratio_big,
)


def _derived_ps(l: DataFrame) -> DataFrame:
    """The lineitem-derived partsupp: one row per (partkey, suppkey)."""
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_availqty"),
    )


_PS_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_supplycost,
           SUM(l_quantity) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
"""


@register(
    "q2_min_cost_supplier",
    oracle=f"""
        WITH ps AS ({_PS_SQL}),
        pse AS (
            SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
            FROM ps JOIN supplier ON ps_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        FROM pse JOIN part ON p_partkey = ps_partkey
        WHERE p_size BETWEEN 20 AND 30 AND p_type = 'LARGE'
          AND ps_supplycost = (SELECT MIN(p2.ps_supplycost) FROM pse p2
                               WHERE p2.ps_partkey = pse.ps_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    tags=("join", "tpch", "correlated-subquery", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: for each qualifying part, the EUROPE supplier with
    the minimum derived supply cost. The correlated MIN subquery is
    decorrelated into a per-part aggregate joined back — one extra
    shuffle on ps_partkey instead of a per-row rescan. Supplier/nation/
    region dims broadcast; the min-cost equality compares doubles both
    engines computed identically (MIN of identical per-row quotients)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(20, 30) & (F.col("p_type") == "LARGE")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pse = _derived_ps(l).join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = pse.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        pse.join(min_cost, (F.col("ps_partkey") == F.col("mk"))
                 & (F.col("ps_supplycost") == F.col("min_cost")))
        .join(scaled_broadcast(p, sf_dir, "part"), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_national_market_share",
    oracle="""
        SELECT o_year,
               CAST((SUM(CASE WHEN nation = 'NATION_2'
                         THEN CAST(FLOOR(volume * 10000.0 + 0.5) AS BIGINT) ELSE 0 END)
                     // SUM(CAST(FLOOR(volume * 10000.0 + 0.5) AS BIGINT))) * 10000
                    + ((SUM(CASE WHEN nation = 'NATION_2'
                            THEN CAST(FLOOR(volume * 10000.0 + 0.5) AS BIGINT) ELSE 0 END)
                        % SUM(CAST(FLOOR(volume * 10000.0 + 0.5) AS BIGINT))) * 10000
                       + SUM(CAST(FLOOR(volume * 10000.0 + 0.5) AS BIGINT)) // 2)
                      // SUM(CAST(FLOOR(volume * 10000.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS mkt_share_e4
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part JOIN lineitem ON p_partkey = l_partkey
                      JOIN supplier ON s_suppkey = l_suppkey
                      JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation n1 ON c_nationkey = n1.n_nationkey
                      JOIN region ON n1.n_regionkey = r_regionkey
                      JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
        )
        GROUP BY o_year
    """,
    tags=("join", "tpch", "conditional-agg"),
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: NATION_2's share of ASIA's ECONOMY-part purchase
    volume per year. Five dimension joins all broadcast; only
    lineitem⋈orders shuffles. The share is a conditional-sum ratio in
    one aggregation pass (no self-join)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    n1 = n.select("n_nationkey", "n_regionkey")
    cust_asia = (
        c.join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("nation"))),
        s.s_nationkey == F.col("nk2"),
    ).select("s_suppkey", "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(scaled_broadcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(scaled_broadcast(cust_asia, sf_dir, "customer"), o.o_custkey == cust_asia.c_custkey)
        .join(scaled_broadcast(supp_nation, sf_dir, "supplier"), l.l_suppkey == supp_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            int_ratio_big(
                F.sum(
                    F.when(
                        F.col("nation") == "NATION_2",
                        F.floor(vol * 10000.0 + F.lit(0.5)).cast("bigint"),
                    ).otherwise(F.lit(0))
                ),
                gsum(vol, 4),
                4,
            ).alias("mkt_share_e4")
        )
    )


@register(
    "q9_product_type_profit",
    bench=True,
    oracle=f"""
        WITH ps AS ({_PS_SQL})
        SELECT nation, o_year, SUM(amount_e4) / 10000.0 AS sum_profit
        FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   CAST(FLOOR((l_extendedprice * (1 - l_discount)
                     - ps_supplycost * l_quantity) * 10000) AS BIGINT) AS amount_e4
            FROM lineitem JOIN part ON p_partkey = l_partkey
                          JOIN supplier ON s_suppkey = l_suppkey
                          JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
                          JOIN orders ON o_orderkey = l_orderkey
                          JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
        )
        GROUP BY nation, o_year
    """,
    tags=("join", "tpch", "derived-table"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit on widget parts by supplier nation and
    year, with supply cost taken from the lineitem-derived partsupp.
    The derived ps is one shuffle agg on (partkey, suppkey); the join
    back to lineitem reuses that same key pair. Part filter broadcast,
    pushed before the expensive joins. The profit amount mixes positive
    and negative terms (cancellation), so it is quantized per-row to
    integer ten-thousandths and summed exactly — a double sum here is
    not reproducible even across Spark runs (partition order varies)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    lw = l.join(scaled_broadcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
    ps = _derived_ps(lw)
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        lw.join(
            ps,
            (lw.l_partkey == ps.ps_partkey) & (lw.l_suppkey == ps.ps_suppkey),
        )
        .join(o, lw.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp_nation), lw.l_suppkey == supp_nation.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(F.floor(amount * 10000).cast("long")).alias("sum_e4"))
        .select(
            "nation", "o_year", (F.col("sum_e4") / F.lit(10000.0)).alias("sum_profit")
        )
    )


@register(
    "q11_important_stock",
    oracle=f"""
        WITH ps AS ({_PS_SQL}),
        nps AS (
            SELECT ps_partkey,
                   CAST(FLOOR(ps_supplycost * ps_availqty * 10000) AS BIGINT) AS v_e4
            FROM ps JOIN supplier ON ps_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_0'
        )
        SELECT ps_partkey, SUM(v_e4) / 10000.0 AS part_value
        FROM nps
        GROUP BY ps_partkey
        HAVING SUM(v_e4) * 600 > (SELECT SUM(v_e4) FROM nps)
    """,
    tags=("join", "tpch", "scalar-subquery", "having"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: parts whose NATION_0 stock value exceeds 1/600 of
    the nation's total. The per-row value is quantized to integer
    ten-thousandths via FLOOR (multiply and floor are bit-identical
    IEEE ops on the identical product double) and summed as BIGINT, so
    both the HAVING threshold and the output are exact and
    order-independent — a double sum here could flip membership at the
    threshold between engines or cluster sizes, and decimal CASTs
    round half-boundaries differently across engines. The global total
    is a one-row broadcast; the threshold compares integers."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    nps = (
        _derived_ps(l)
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            F.floor(F.col("ps_supplycost") * F.col("ps_availqty") * 10000)
            .cast("long")
            .alias("v_e4"),
        )
    )
    per_part = nps.groupBy("ps_partkey").agg(F.sum("v_e4").alias("sum_e4"))
    total = nps.agg(F.sum("v_e4").alias("total_e4"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("sum_e4") * 600 > F.col("total_e4"))
        .select("ps_partkey", (F.col("sum_e4") / F.lit(10000.0)).alias("part_value"))
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    tags=("join", "tpch", "conditional-agg", "datetime"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style (shipmode -> lateness bucket): order-priority mix
    of on-time vs late (>60 days after order) shipments in 1996. One
    fact-fact join, counts only — exact in any engine."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                "LATE",
            ).otherwise("ONTIME"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_revenue_e4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_e4
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM revenue)
    """,
    tags=("join", "tpch", "scalar-subquery", "argmax"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: the supplier(s) with maximum Q1-1996 revenue.
    The revenue CTE is computed once (cached plan reuse is Catalyst's
    job via ReuseExchange); the MAX is a one-row broadcast joined back
    — no second scan of lineitem."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    # Revenue is quantized per item (exact BIGINT) BEFORE the argmax cut:
    # with raw double sums, which supplier(s) hit the max could depend on
    # summation order — a row-membership hazard, not just a display one.
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        gsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue_e4"
        )
    )
    top = revenue.agg(F.max("total_revenue_e4").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue_e4") == F.col("max_rev"))
        .join(scaled_broadcast(s, sf_dir, "supplier"), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_e4")
    )


@register(
    "q16_supplier_part_attr_counts",
    oracle="""
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
              FROM lineitem) ps
             JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "tpch", "distinct-agg", "anti"),
)
def q16_supplier_part_attr_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct supplier counts per part attribute
    triple, excluding negative-balance suppliers (NOT IN -> broadcast
    anti-join). The DISTINCT pair projection is the derived partsupp's
    key set; count-distinct runs as a two-phase partial/final agg."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = l.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    return (
        pairs.join(scaled_broadcast(bad, sf_dir, "supplier"), pairs.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(scaled_broadcast(p, sf_dir, "part"), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_part_promotion_suppliers",
    oracle="""
        WITH qty AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
                             AND l_shipdate <  TIMESTAMP '1996-01-01'
                            THEN l_quantity ELSE 0 END) AS qty95,
                   SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                             AND l_shipdate <  TIMESTAMP '1997-01-01'
                            THEN l_quantity ELSE 0 END) AS qty96
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_13', 'NATION_18', 'NATION_23')
          AND s_suppkey IN (SELECT l_suppkey FROM qty
                            WHERE qty96 > 0 AND qty95 > 0.5 * qty96)
    """,
    tags=("join", "tpch", "semi", "nested-subquery"),
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: EUROPE-nation suppliers whose 1995 shipments of
    red parts exceeded half their 1996 shipments (1995 volume proxies
    the spec's ps_availqty stock check). Nested IN subqueries become a
    broadcast semi-join chain; quantities are integral doubles so the
    0.5x threshold is exact — no cross-engine membership flips."""
    l = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13", "NATION_18", "NATION_23")
    )
    in95 = (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    in96 = (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    qty = (
        l.join(scaled_broadcast(red, sf_dir, "part"), l.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in95, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty95"),
            F.sum(F.when(in96, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty96"),
        )
    )
    promo_supp = qty.filter(
        (F.col("qty96") > 0) & (F.col("qty95") > 0.5 * F.col("qty96"))
    ).select("l_suppkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(promo_supp, s.s_suppkey == promo_supp.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_suppliers_kept_waiting",
    bench=True,
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
             JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    tags=("join", "tpch", "exists", "not-exists", "topk"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: suppliers who were the SOLE late supplier on a
    finished multi-supplier order ("late" = shipped >90 days after the
    order date). The EXISTS/NOT-EXISTS pair is decorrelated into
    per-(order, supplier) late-line counts — NOT two extra lineitem
    self-joins — and everything downstream derives from that one
    aggregate.

    Scale design (round-7 rewrite, measured at sf10/60 M lineitem): the
    original branched twice off the lineitem⋈orders join (Spark
    recomputes it per branch) and paid a 2x row EXPAND for two
    count_distincts; this shape runs the fact-fact join ONCE, reduces it
    immediately to (order, supplier, n_late_lines) — ~lineitem/1.2 rows,
    3 int-ish columns — localCheckpoints that reduction (the kcore/CC/
    k-means precedent), and derives both the per-order sole-late filter
    and the waiter counts from it with plain hash aggregates. numwait ==
    the oracle's COUNT(*) over late l1 lines because sum(n_late_lines)
    over the sole-late supplier's orders counts exactly those lines."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    per_supp = (
        lo.groupBy("o_orderkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.col("is_late"), F.lit(1)).otherwise(F.lit(0))).alias(
                "n_late_lines"
            )
        )
        .localCheckpoint()
    )
    per_order = per_supp.groupBy("o_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.when(F.col("n_late_lines") > 0, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_late_supp"
        ),
    )
    sole_late_orders = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("o_orderkey")
    waiters = per_supp.filter(F.col("n_late_lines") > 0).join(
        sole_late_orders, "o_orderkey", "left_semi"
    )
    return (
        waiters.join(scaled_broadcast(s, sf_dir, "supplier"), waiters.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q22_dormant_customer_balance",
    oracle="""
        WITH pool AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer
            WHERE c_nationkey IN (2, 7, 12, 17, 22)
        )
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS totacctbal_e2
        FROM pool
        WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
                                  / (100.0 * COUNT(*))
                           FROM pool WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey
    """,
    tags=("join", "tpch", "anti", "scalar-subquery"),
)
def q22_dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance ASIA customers with no
    orders since 1999 (c_nationkey stands in for the spec's phone
    country code). The positive-balance average is a one-row broadcast;
    the no-recent-orders check is a broadcast anti-join against the
    date-filtered orders scan (filter pushed below the distinct)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(2, 7, 12, 17, 22)
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    # Threshold from exact integer cents (sum_e2 / (100*count)) so the
    # row-membership comparison is the same double in both engines.
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            gsum(F.col("c_acctbal"), 2).cast("double")
            / (F.lit(100.0) * F.count("*"))
        ).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            gsum(F.col("c_acctbal"), 2).alias("totacctbal_e2"),
        )
    )
