"""Source/sink breadth beyond the csv/jsonl/parquet round-trips in
test_sinks.py: ORC, and date-partitioned parquet layout with verified
partition pruning (the at-rest layout that lets a 100 TB table serve a
one-day query by touching one directory).
"""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.sources.catalog import load_table

from .conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_orc_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orders_orc")
    orders = load_table(spark, SF_SMALL, "orders")
    orders.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == orders.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in orders.schema.fields]
    # Predicate pushdown works on ORC scans too.
    plan = _plan(back.filter(F.col("o_totalprice") > 1000).select("o_orderkey"))
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_partitioned_parquet_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "orders_by_month")
    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    orders.write.partitionBy("order_month").parquet(path)

    # Hive-style layout on disk: one directory per month.
    months = sorted(d for d in os.listdir(path) if d.startswith("order_month="))
    assert len(months) > 12, months

    back = spark.read.parquet(path)
    one_month = back.filter(F.col("order_month") == "1996-03")
    plan = _plan(one_month.select("o_orderkey"))
    # The month predicate must appear as a PartitionFilter on the scan
    # (directory-level pruning), not as a post-scan data Filter.
    assert "PartitionFilters" in plan, plan
    scan_line = plan[plan.index("PartitionFilters"):].split("]", 1)[0]
    assert "order_month" in scan_line, plan

    expected = orders.filter(F.col("order_month") == "1996-03").count()
    assert one_month.count() == expected > 0


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4 built-in XML source: schema'd round-trip with rowTag —
    the remaining first-class file format after parquet/csv/jsonl/orc/
    text (hierarchical feeds land as XML more often than anyone likes)."""
    out = str(tmp_path / "x")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, "c", 0.25)], ["id", "name", "score"]
    )
    df.write.format("xml").option("rootTag", "rows").option("rowTag", "row").mode(
        "overwrite"
    ).save(out)
    back = spark.read.format("xml").option("rowTag", "row").schema(
        "id bigint, name string, score double"
    ).load(out)
    assert {tuple(r) for r in back.collect()} == {(1, "a", 1.5), (2, "b", -2.0), (3, "c", 0.25)}


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution: a dataset whose later files add a column must
    read with mergeSchema=true as the superset schema, nulls for the
    files written before the column existed — the append-only contract
    of a long-lived 100 TB table."""
    out = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(out + "/p=1")
    spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"]).write.parquet(
        out + "/p=2"
    )
    back = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(back.columns) == {"id", "name", "score", "p"}
    rows = {(r.id, r.name, r.score) for r in back.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}
