"""Approximate/sketch aggregates — the 100 TB substitutes for exact
distinct/percentile. Cross-engine value-hash oracles don't apply (each
engine's HLL/quantile sketch differs), so capability is asserted here as
bounded relative error against the exact answer on the same data."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_5pct(spark):
    e = spark.read.parquet(f"{SF}/orders.parquet")
    row = e.agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05, row


def test_approx_percentile_within_tolerance(spark):
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = l.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01, row


def test_hll_sketch_agg_mergeable(spark):
    """hll_sketch_agg/hll_union_agg: the mergeable-sketch path (partial
    sketches per partition/day, union later) that replaces COUNT(DISTINCT)
    re-scans in incremental pipelines."""
    from multithreaded_map_reduce_library_spark.sources.catalog import load_table

    e = load_table(spark, SF, "events")
    daily = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")).collect()[0]
    exact = e.select("user_id").distinct().count()
    assert abs(merged.est - exact) / exact < 0.05, (merged.est, exact)
