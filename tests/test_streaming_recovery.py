"""Checkpoint/restart recovery: a streaming aggregation stopped mid-input
and restarted from its checkpoint must (a) process only the NEW files on
restart (incremental, not a rescan) and (b) end with exactly the batch
answer over all input — the durability contract a 100 TB/day ingest
pipeline relies on."""

from __future__ import annotations

import glob
import os
import shutil

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _drain(spark, src_dir, schema, checkpoint, name):
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    files_read = sum(p["numInputRows"] for p in progress)
    return spark.table(name), files_read


def test_checkpoint_restart_is_incremental(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    full = spark.read.parquet(f"{SF}/events.parquet")
    schema = full.schema
    n_total = full.count()

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # Stage half the input, drain, record how many rows the run ingested.
    half1, half2 = str(tmp_path / "h1"), str(tmp_path / "h2")
    full.limit(n_total // 2).write.mode("overwrite").parquet(half1)
    full.subtract(full.limit(n_total // 2)).write.mode("overwrite").parquet(half2)
    for i, f in enumerate(glob.glob(f"{half1}/part-*.parquet")):
        shutil.copy(f, f"{src}/a{i}.parquet")

    res1, rows1 = _drain(spark, src, schema, ckpt, "recov_run1")
    n1 = sum(r["n"] for r in res1.collect())

    # Add the second half and RESTART from the same checkpoint.
    for i, f in enumerate(glob.glob(f"{half2}/part-*.parquet")):
        shutil.copy(f, f"{src}/b{i}.parquet")
    res2, rows2 = _drain(spark, src, schema, ckpt, "recov_run2")

    # (a) incremental: the restarted run ingested only the new rows.
    assert rows2 == n_total - rows1, (rows1, rows2, n_total)
    # (b) exactly the batch answer over the full input.
    batch = {
        (r["event_type"], r["n"], r["v"])
        for r in full.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .collect()
    }
    assert {tuple(r) for r in res2.collect()} == batch
    assert n1 <= n_total
