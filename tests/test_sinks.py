from __future__ import annotations

import glob
import os

from multithreaded_map_reduce_library_spark.functions.hashing import djb2, djb2_expr
from multithreaded_map_reduce_library_spark.sources.sinks import write_partitioned_text
from pyspark.sql import functions as F


def test_djb2_expr_matches_python(spark):
    words = ["This", "is", "a", "test", "five-thousand", "x", "mapreduce"]
    df = spark.createDataFrame([(w,) for w in words], ["key"])
    rows = df.select("key", djb2_expr("key", 10).alias("pid")).collect()
    for r in rows:
        assert r["pid"] == djb2(r["key"], 10), r["key"]


def test_partitioned_text_sink_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("apple", 3), ("banana", 2), ("cherry", 7), ("date", 1)], ["key", "value"]
    )
    out = str(tmp_path / "out")
    write_partitioned_text(df, out, num_partitions=4)
    seen = {}
    for d in glob.glob(f"{out}/pid=*"):
        pid = int(os.path.basename(d).split("=")[1])
        lines = []
        for f in glob.glob(f"{d}/part-*"):
            lines += [ln for ln in open(f).read().splitlines() if ln]
        keys = [ln.split(": ")[0] for ln in lines]
        assert keys == sorted(keys)  # strcmp order within shard (quirk Q3)
        for k in keys:
            assert djb2(k, 4) == pid
        seen.update(dict(ln.split(": ") for ln in lines))
    assert seen == {"apple": "3", "banana": "2", "cherry": "7", "date": "1"}
