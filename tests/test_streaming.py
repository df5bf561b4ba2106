"""Structured Streaming must produce exactly the batch answer when drained
with AvailableNow (streaming/batch unification)."""

from __future__ import annotations

from multithreaded_map_reduce_library_spark.plans.relational import events_hourly_tumbling
from multithreaded_map_reduce_library_spark.streaming.windows import (
    events_stream,
    hourly_counts_stream,
    run_stream_to_df,
    sliding_counts_stream,
)
from tests.conftest import SF_SMALL


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_hourly_equals_batch(spark):
    stream_res = run_stream_to_df(spark, hourly_counts_stream(events_stream(spark, SF_SMALL)))
    batch_res = events_hourly_tumbling(spark, SF_SMALL)
    assert _as_set(stream_res) == _as_set(batch_res)


def test_sliding_windows_double_count(spark):
    res = run_stream_to_df(spark, sliding_counts_stream(events_stream(spark, SF_SMALL)))
    rows = res.collect()
    # every event lands in exactly 2 sliding windows (1h window, 30min slide)
    from multithreaded_map_reduce_library_spark.sources.catalog import load_table

    n_events = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["n_events"] for r in rows) == 2 * n_events


def test_rate_source_produces_monotonic_rows(spark):
    """The built-in rate source (load/soak-test generator): a bounded
    drain must yield consecutive values with event-time timestamps — the
    synthetic-ingest tool for exercising a streaming topology without
    real data."""
    import uuid

    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline and spark.table(name).count() < 100:
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert len(rows) >= 100
    vals = sorted(r["value"] for r in rows)
    assert vals == list(range(vals[0], vals[0] + len(vals)))


def test_empty_stream_returns_empty_df_with_schema(spark):
    """A drained stream that emits ZERO rows must return an empty
    DataFrame with the plan's schema, not raise 'Unable to infer schema'
    (ADVICE r7: the sink dir has no parquet part files to infer from)."""
    from pyspark.sql import functions as F

    src = events_stream(spark, SF_SMALL).where(F.lit(False))
    res = run_stream_to_df(spark, src, output_mode="append")
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        f.name for f in src.schema.fields
    ]


def test_startup_sweep_reclaims_dead_pid_dirs(tmp_path):
    """VERDICT r8 item 5: SIGKILL skips atexit, so a fresh session's
    import sweeps mtmrl_stream_* dirs whose embedded pid is dead (and
    hour-aged legacy dirs without one), leaving live-pid dirs alone."""
    import os
    import subprocess
    import time as _time

    import multithreaded_map_reduce_library_spark.streaming.windows as W

    p = subprocess.Popen(["true"])
    p.wait()
    dead_pid = p.pid  # just exited and reaped; pid not reused yet
    me = os.getpid()
    tmp = str(tmp_path)
    keep = [
        tmp_path / f"mtmrl_stream_src_abc123_{me}",
        tmp_path / f"mtmrl_stream_out_p{me}_x1",
        tmp_path / "mtmrl_stream_out_legacyfresh",  # no pid, fresh
        tmp_path / "mtmrl_stream_out_2_tta6tw",  # legacy suffix w/ digits, fresh
        tmp_path / "unrelated_dir",
    ]
    gone = [
        tmp_path / f"mtmrl_stream_src_def456_{dead_pid}",
        tmp_path / f"mtmrl_stream_out_p{dead_pid}_x2",
        tmp_path / f"mtmrl_stream_ckpt_p{dead_pid}_x3",
        tmp_path / "mtmrl_stream_out_legacyaged",
    ]
    for d in keep + gone:
        d.mkdir()
    old = _time.time() - 7200
    os.utime(gone[-1], (old, old))
    removed = W._sweep_stale_stream_tmpdirs(tmp=tmp)
    assert removed == len(gone)
    assert all(d.exists() for d in keep)
    assert not any(d.exists() for d in gone)


def test_foreachbatch_sink_isolates_batches(spark):
    """Each micro-batch writes its own b<batch_id> subdir (at-least-once
    idempotency: a retried batch overwrites itself, never re-appends) and
    append mode unions exactly the per-batch outputs."""
    import os

    import multithreaded_map_reduce_library_spark.streaming.windows as W

    monkey_dirs: list[str] = []
    ckpt_dirs: list[str] = []
    orig = W.tempfile.mkdtemp

    def capture(prefix: str = "tmp", **kw):
        d = orig(prefix=prefix, **kw)
        if prefix.startswith("mtmrl_stream_out_"):
            monkey_dirs.append(d)
        elif prefix.startswith("mtmrl_stream_ckpt_"):
            ckpt_dirs.append(d)
        return d

    W.tempfile.mkdtemp = capture
    try:
        os.environ["SPARK_GRAFT_STREAM_MAXFILES"] = "1"
        src = events_stream(spark, SF_SMALL)
        res = run_stream_to_df(
            spark, src.select("event_id"), output_mode="append"
        )
        n = res.count()
    finally:
        W.tempfile.mkdtemp = orig
        os.environ.pop("SPARK_GRAFT_STREAM_MAXFILES", None)
    assert n > 0
    out_dir = monkey_dirs[-1]
    subdirs = [d for d in os.listdir(out_dir) if d.startswith("b")]
    assert subdirs, "expected per-batch b<id> subdirs in the sink dir"
    # THIS call's checkpoint dir was removed as soon as the query
    # terminated (scoped to the captured dir — global /tmp state may
    # hold other sessions' dirs, code-review r8)
    assert ckpt_dirs and not os.path.exists(ckpt_dirs[-1])
