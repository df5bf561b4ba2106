"""Malformed-input handling and in-flight query metrics.

A 100 TB ingest ALWAYS contains broken records; the engine's contract is
PERMISSIVE capture (quarantine column) rather than job failure — the
moral opposite of the reference, which asserts/crashes on a missing file
(mapreduce.c:66-69 + distwc.c:10, SURVEY.md Q4).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def test_corrupt_json_records_quarantined(spark, tmp_path):
    path = tmp_path / "in.jsonl"
    path.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2, "name": "also ok"}\n'
        "{this is not json}\n"
        '{"id": "not a number", "name": 3}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(path))
        .cache()  # corrupt-record column requires materialization first
    )
    assert df.count() == 4  # nothing dropped, nothing crashed
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    good = df.filter(F.col("_corrupt_record").isNull())
    assert bad.count() == 2
    assert {r["id"] for r in good.collect()} == {1, 2}
    # DROPMALFORMED: the strict-pipeline alternative, keeps only parseable rows.
    dropped = (
        spark.read.schema(StructType(schema.fields[:2]))
        .option("mode", "DROPMALFORMED")
        .json(str(path))
    )
    assert dropped.count() == 3  # type-mismatch row keeps null id but parses
    df.unpersist()


def test_observation_metrics_piggyback_on_query(spark):
    """df.observe(): named aggregate metrics collected during the normal
    action — row counts / null rates / value bounds for pipeline health,
    with NO second scan of the input (at 100 TB a separate count() pass
    doubles the read)."""
    from pyspark.sql import Observation

    from multithreaded_map_reduce_library_spark.sources.catalog import load_table

    from .conftest import SF_SMALL

    obs = Observation("health")
    orders = load_table(spark, SF_SMALL, "orders")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("null_prices"),
        F.max("o_orderdate").alias("max_date"),
    )
    n = observed.filter(F.col("o_totalprice") > 0).count()
    metrics = obs.get
    assert metrics["rows_seen"] == orders.count() >= n
    assert metrics["null_prices"] == 0
    assert metrics["max_date"] is not None
