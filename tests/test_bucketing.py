"""Bucketed co-located join: the SCALING.md claim that bucketing
lineitem+orders on orderkey deletes the fact-fact shuffle, demonstrated
end-to-end with saveAsTable(bucketBy) and a plan assertion."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/li_b")
        .saveAsTable("li_b")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/or_b")
        .saveAsTable("or_b")
    )
    yield "li_b", "or_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS or_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, orr = bucketed_tables
    # Disable broadcast so the join strategy decision is about shuffles.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(li)
            .join(spark.table(orr), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # AQE prints both final and initial plans; only the final one ran.
        plan = plan.split("== Initial Plan ==")[0]
        assert "Bucketed: true" in plan
        # Both sides are bucketed on the join key: the join itself needs no
        # exchange; the only exchange is the final tiny aggregation.
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1, f"expected bucket-pruned join, got:\n{plan[:3000]}"

        # Same answer as the unbucketed plan.
        plain = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert sorted((r.o_orderstatus, round(r.q, 4)) for r in j.collect()) == sorted(
            (r.o_orderstatus, round(r.q, 4)) for r in plain.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
