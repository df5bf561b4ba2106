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


def test_ivf_corpus_bucketed_by_cell_prunes_probes(spark, tmp_path_factory):
    """The SCALING.md ANN claim, executable: the IVF corpus stored
    bucketed by cell lets a probe read ONLY its cell's bucket
    (SelectedBucketsCount in the scan) instead of the full posting
    file set — the at-rest layout that turns an ANN probe into a
    single-bucket read at 100 TB."""
    import contextlib
    import io

    from multithreaded_map_reduce_library_spark.operators.similarity import (
        assign_ivf_cells,
    )

    wh = str(tmp_path_factory.mktemp("ann_wh"))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = assign_ivf_cells(emb, stride=50).select("id", "cell")
    (
        cells.write.mode("overwrite")
        .bucketBy(8, "cell")
        .sortBy("cell")
        .option("path", f"{wh}/cells_b")
        .saveAsTable("cells_b")
    )
    try:
        # autoBucketedScan may demote a filter-only scan to non-bucketed
        # (no join to feed); pin it on so the pruning the layout enables
        # is visible in the plan.
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        probe = spark.table("cells_b").filter(F.col("cell") == 0)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            probe.explain("formatted")
        plan = buf.getvalue()
        assert "SelectedBucketsCount" in plan, plan
        sel = plan.split("SelectedBucketsCount:", 1)[1].split("\n", 1)[0]
        assert "1 out of 8" in sel, sel
        # and the probe actually returns that cell's members
        assert probe.count() > 0
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS cells_b")
