"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over multithreaded_map_reduce_library_spark.plans.registry — every
implemented operator from SURVEY.md §2 (plus the driver-mandated pipeline
extensions) registers there with its Spark plan and, where SQL-expressible,
a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multithreaded_map_reduce_library_spark.plans import registry as _registry
from multithreaded_map_reduce_library_spark.session import tune_existing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-style pricing
    summary (scan -> pushed filter -> partial+final hash aggregate)."""
    tune_existing(spark)
    from multithreaded_map_reduce_library_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _registry.oracle_sql()
