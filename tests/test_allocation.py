"""Exact-money invariants for the allocation operators: whatever the
split rule, money must be conserved to the cent — the property the
largest-remainder method exists to guarantee."""

from __future__ import annotations

import pyspark.sql.functions as F

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

from .conftest import SF_SMALL


def test_proration_conserves_order_totals(spark):
    alloc = all_queries()["proration_largest_remainder"].fn(spark, SF_SMALL)
    sums = alloc.groupBy("l_orderkey").agg(F.sum("alloc_cents").alias("got"))
    totals = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("want"),
    )
    bad = sums.join(totals, "l_orderkey").filter(F.col("got") != F.col("want"))
    assert bad.count() == 0, bad.limit(5).collect()


def test_attribution_conserves_purchase_value(spark):
    att = all_queries()["linear_attribution_purchases"].fn(spark, SF_SMALL)
    sums = att.groupBy("p_id").agg(F.sum("attributed_cents").alias("got"))
    purchases = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.floor(F.col("value") * 100).cast("long").alias("want"),
        )
    )
    # Purchases with no preceding click are absent entirely (inner join);
    # every attributed purchase must conserve its value exactly.
    bad = sums.join(purchases, "p_id").filter(F.col("got") != F.col("want"))
    assert bad.count() == 0, bad.limit(5).collect()


def test_equi_depth_buckets_are_balanced(spark):
    h = all_queries()["equi_depth_histogram_prices"].fn(spark, SF_SMALL)
    rows = h.collect()
    assert len(rows) == 10
    counts = [r["n"] for r in rows]
    assert max(counts) - min(counts) <= 1, counts
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["hi"] <= b["lo"], (a, b)


def test_proration_conserves_on_generated_orders(spark):
    """Property: for arbitrary (total_cents, quantities) the
    largest-remainder allocation conserves the total exactly and every
    share differs from exact proportionality by less than one cent."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from multithreaded_map_reduce_library_spark.plans.registry import all_queries  # noqa: F401

    import pyspark.sql.functions as F2

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=10_000_000),
                st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=7),
            ),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
    def run(orders):
        li = [
            (ok, ln, qty)
            for ok, (_, qtys) in enumerate(orders)
            for ln, qty in enumerate(qtys)
        ]
        o = [(ok, cents) for ok, (cents, _) in enumerate(orders)]
        li_df = spark.createDataFrame(li, ["l_orderkey", "l_linenumber", "qty"])
        o_df = spark.createDataFrame(o, ["o_orderkey", "total_cents"])
        from pyspark.sql.window import Window

        per = Window.partitionBy("l_orderkey")
        j = li_df.join(o_df, li_df.l_orderkey == o_df.o_orderkey).withColumn(
            "sumq", F2.sum("qty").over(per)
        )
        s = j.select(
            "l_orderkey", "l_linenumber", "total_cents", "qty", "sumq",
            F2.expr("(total_cents * qty) div sumq").alias("base"),
            F2.expr("(total_cents * qty) % sumq").alias("frac"),
        ).withColumn("alloc_base", F2.sum("base").over(per))
        rk = Window.partitionBy("l_orderkey").orderBy(
            F2.col("frac").desc(), F2.col("l_linenumber")
        )
        out = s.withColumn("rk", F2.row_number().over(rk)).withColumn(
            "alloc",
            F2.col("base")
            + F2.when(
                F2.col("rk") <= F2.col("total_cents") - F2.col("alloc_base"), 1
            ).otherwise(0),
        )
        rows = out.collect()
        by_order = {}
        for r in rows:
            by_order.setdefault(r.l_orderkey, []).append(r)
        for ok, rs in by_order.items():
            total = rs[0].total_cents
            assert sum(r.alloc for r in rs) == total
            sumq = rs[0].sumq
            for r in rs:
                exact = total * r.qty / sumq
                assert abs(r.alloc - exact) < 1.0 + 1e-9

    run()
