"""Sinks. The reference's only sink is a hash-partitioned local text append:
``result-<djb2(key) mod P>.txt`` with ``"key: value"`` lines in strcmp order
(distwc.c:31-34, SURVEY.md O10/Q3).

Spark-first equivalent: compute the partition id as a JVM-side column,
``repartition`` on it (one task per shard — same write parallelism the
reference gets from one reduce job per partition, mapreduce.c:79-84),
``sortWithinPartitions`` for the strcmp order, and ``partitionBy`` on write
so each shard lands in its own directory. No Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.hashing import djb2_expr


def write_partitioned_text(
    df: DataFrame,
    output_dir: str,
    key_col: str = "key",
    value_col: str = "value",
    num_partitions: int = 10,
    sep: str = ": ",
) -> None:
    """Reference-parity partitioned text sink (O10).

    Output layout: ``<output_dir>/pid=<p>/part-*.txt`` where
    ``p = djb2(key) % num_partitions`` and lines are ``key<sep>value`` in
    byte (strcmp) order within each shard — matching ``result-<p>.txt``
    up to the directory naming.
    """
    out = (
        df.withColumn("pid", djb2_expr(key_col, num_partitions))
        .withColumn("line", F.concat(F.col(key_col), F.lit(sep), F.col(value_col).cast("string")))
        .repartition(num_partitions, "pid")
        .sortWithinPartitions("pid", key_col)
        .select("pid", "line")
    )
    out.write.mode("overwrite").partitionBy("pid").text(output_dir)


def write_parquet(
    df: DataFrame, output_dir: str, partition_cols: list[str] | None = None
) -> None:
    """Columnar sink; ``partition_cols`` become hive-style directories that
    later scans partition-prune on."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(output_dir)


def write_csv(df: DataFrame, output_dir: str, header: bool = True) -> None:
    w = df.write.mode("overwrite").option("header", str(header).lower())
    w.csv(output_dir)


def write_jsonl(df: DataFrame, output_dir: str) -> None:
    df.write.mode("overwrite").json(output_dir)
