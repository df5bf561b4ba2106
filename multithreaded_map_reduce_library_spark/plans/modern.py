"""Spark 4 surfaces: the VARIANT semi-structured type.

Reference parity note: the reference has no semi-structured data
(SURVEY.md §2.2); VARIANT is the current Spark-native replacement for
JSON-string re-parsing (shredded binary encoding). The companion Spark 4
surface — transformWithState arbitrary-state streaming — is implemented
in streaming/windows.py::tws_user_totals_stream but NOT registered as a
query: its state-server protocol needs the ``protobuf`` package, absent
from this container (gated via importorskip in
tests/test_streaming_late.py; applyInPandasWithState covers the custom-
stateful-operator contract in the registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "variant_props_events",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
    """,
    tags=("variant", "json", "semi-structured"),
)
def variant_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the VARIANT type: parse_json once
    into Variant, variant_get typed path extraction, aggregate. Unlike
    get_json_object (string re-parse per access), VARIANT parses once
    into a binary encoding that columnar readers can shred — at 100 TB
    the difference between a parse-bound and a scan-bound job. Same
    answers as the JSON-string path (json_props_events)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )
