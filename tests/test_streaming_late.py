"""Watermark late-data semantics and the foreachBatch sink.

The late-data test drives two micro-batches as two AvailableNow runs
sharing one checkpoint (the watermark persists in the checkpoint across
restarts): run 1 advances the watermark past an old window and emits it;
run 2 delivers a row for that window. The late row must be dropped — if
it weren't, fresh state for the closed window would re-emit it, and the
append-mode sink would see the window twice. This is the state-bounding
guarantee that makes watermarked aggregation viable at 100 TB/day rates
(state for closed windows is evicted, arbitrarily-late data cannot
resurrect it).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F


def _write_one_parquet(spark, rows, schema, target_dir, name, mtime):
    """Write rows as exactly one parquet file named `name` in target_dir."""
    tmp = os.path.join(target_dir, f"_stage_{name}")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(target_dir, name)
    shutil.copyfile(part, dest)
    os.utime(dest, (mtime, mtime))
    shutil.rmtree(tmp)
    return dest


def test_late_rows_dropped_beyond_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "id long, ts timestamp"
    from datetime import datetime

    ckpt = str(tmp_path / "ckpt")
    sink_dir = str(tmp_path / "sink")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").cast("timestamp_ntz").alias("ws"), "n")
        )

        def sink(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(sink_dir)

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Run 1: one event in the 09:00 window, plus events advancing the max
    # event time to 12:30 -> watermark (1h) becomes 11:30; append emits
    # the finalized 09:00 and 10:00 windows and evicts their state.
    _write_one_parquet(
        spark,
        [
            (1, datetime(2024, 1, 1, 9, 30)),
            (2, datetime(2024, 1, 1, 10, 30)),
            (3, datetime(2024, 1, 1, 12, 30)),
        ],
        schema,
        src,
        "01.parquet",
        mtime=1_000_000,
    )
    run_once()

    # Run 2 (same checkpoint -> watermark 11:30 restored): a LATE row for
    # the 09:00 window (end 10:00 <= watermark -> dropped) plus a fresh row.
    _write_one_parquet(
        spark,
        [
            (4, datetime(2024, 1, 1, 9, 40)),
            (5, datetime(2024, 1, 1, 13, 30)),
        ],
        schema,
        src,
        "02.parquet",
        mtime=2_000_000,
    )
    run_once()

    rows = spark.read.parquet(sink_dir).collect()
    by_window = {}
    for r in rows:
        by_window.setdefault(r["ws"], []).append(r["n"])
    # Emitted exactly once, with ONLY the on-time row. If the late row had
    # been accepted it would have re-created state for the closed window
    # and re-emitted it (a second 09:00 row, or n=2).
    assert by_window[datetime(2024, 1, 1, 9, 0)] == [1], by_window


def test_foreachbatch_sink_sees_every_row(spark, tmp_path):
    """foreachBatch: arbitrary per-micro-batch sink logic (upserts, JDBC,
    multi-sink fanout). Drained with AvailableNow, the batches must
    partition the input exactly — no loss, no duplication."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "id long, ts timestamp"
    from datetime import datetime

    n_rows = 10
    _write_one_parquet(
        spark,
        [(i, datetime(2024, 1, 1, 8, i)) for i in range(n_rows)],
        schema,
        src,
        "01.parquet",
        mtime=1_000_000,
    )
    out_dir = str(tmp_path / "out")
    seen = []

    def sink(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(n for _, n in seen) == n_rows
    assert spark.read.parquet(out_dir).count() == n_rows


def test_transform_with_state_totals_match_batch(spark):
    """transformWithStateInPandas (Spark 4 StatefulProcessor API). Its
    state-server protocol requires protobuf, which this container lacks —
    skip there; runs (and must equal the batch GROUP BY) where present."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_library_spark.sources.catalog import load_table
    from multithreaded_map_reduce_library_spark.streaming.windows import (
        events_stream,
        run_stream_to_df,
        tws_user_totals_stream,
    )

    from .conftest import SF_SMALL

    updates = run_stream_to_df(
        spark, tws_user_totals_stream(spark, events_stream(spark, SF_SMALL)), "update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = {
        (r["user_id"], r["n_events"])
        for r in updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    batch = {
        (r["user_id"], r["n"])
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final == batch
