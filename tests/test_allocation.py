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
