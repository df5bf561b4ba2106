"""Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource`` API)
reading the reference engine's OUTPUT format: ``result-<p>.txt`` shards
of ``"key: value"`` lines (distwc.c:31-34), so corpora produced by the
original C binary load straight into this engine as a DataFrame::

    from multithreaded_map_reduce_library_spark.sources.python_ds import register
    register(spark)
    df = spark.read.format("mr_result").load("/path/to/result/dir")

Scale design: ``partitions()`` returns one InputPartition per shard
file, so a directory of N shards reads with N-way parallelism and each
task streams its file line-by-line (no whole-file materialization).
The same class is the template for any bespoke format Spark lacks a
reader for — the modern Spark-4 answer to the reference's hand-rolled
``getline`` scan (distwc.c:9-14).
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

SCHEMA = "key string, value string, shard int"
_SHARD_RE = re.compile(r"(\d+)")


class MRResultDataSource(DataSource):
    """``format("mr_result")`` — reference result-shard reader."""

    @classmethod
    def name(cls) -> str:
        return "mr_result"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> "MRResultReader":  # noqa: ARG002
        return MRResultReader(self.options)


class MRResultReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("mr_result: .load(path) is required")
        self.path = path
        self.sep = options.get("sep", ": ")

    def _files(self) -> list[str]:
        if os.path.isfile(self.path):
            return [self.path]
        hits = sorted(glob.glob(os.path.join(self.path, "result-*.txt")))
        if not hits:  # fall back to any plain files in the directory
            hits = sorted(
                f
                for f in glob.glob(os.path.join(self.path, "*"))
                if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
            )
        return hits

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(f) for f in self._files()]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        f = partition.value
        m = _SHARD_RE.search(os.path.basename(f))
        shard = int(m.group(1)) if m else -1
        with open(f, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, _, value = line.rpartition(self.sep)
                yield (key, value, shard)


def register(spark) -> None:
    """Idempotently register the format with a live session."""
    spark.dataSource.register(MRResultDataSource)
