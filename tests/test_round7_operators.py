"""Round-7 session/registry behavior: per-query Arrow batch scoping
(VERDICT r6 item 4) and AQE initial-partition scaling (item 3)."""

from __future__ import annotations

from multithreaded_map_reduce_library_spark.plans.registry import (
    _ARROW_BATCH_DEFAULT,
    _ARROW_BATCH_FAT,
    _FAT_PAYLOAD_TAGS,
    all_queries,
)

from .conftest import SF_SMALL


def test_arrow_batch_cap_scoped_by_tags(spark):
    """Building a fat-payload (image) query must pin the 2048 Arrow
    batch cap; building a skinny-row query right after must restore the
    10000 default — the conf each query runs under is a pure function of
    its own tags, never of run order (the order-invariance rule)."""
    qs = all_queries()
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    qs["multimodal_jpeg_roundtrip"].fn(spark, SF_SMALL)
    assert spark.conf.get(key) == _ARROW_BATCH_FAT
    qs["simhash_fingerprint"].fn(spark, SF_SMALL)
    assert spark.conf.get(key) == _ARROW_BATCH_DEFAULT
    # the regressed audio kernel is skinny-row: must get the default
    qs["multimodal_wav_vad_features"].fn(spark, SF_SMALL)
    assert spark.conf.get(key) == _ARROW_BATCH_DEFAULT


def test_fat_payload_tag_set_matches_registry():
    """Every fat-tagged query exists and every image/video-payload query
    carries at least one fat tag (a new image query that forgets its tag
    silently loses the batch bound — catch it here)."""
    qs = all_queries()
    fat = {n for n, q in qs.items() if _FAT_PAYLOAD_TAGS & set(q.tags)}
    assert "multimodal_jpeg_roundtrip" in fat
    assert "multimodal_jpeg_multiscan_color420" in fat
    assert "multimodal_png_roundtrip" in fat
    assert "multimodal_keyframe_select" in fat  # video
    # audio is deliberately NOT fat (BENCH_r06 measured the cap costing
    # wav_vad +36% on its skinny rows)
    assert "multimodal_wav_vad_features" not in fat
    assert "simhash_fingerprint" not in fat


def test_initial_partition_num_is_session_default(spark):
    """SCALING_10X's measured knob is code now: AQE shuffles start at
    max(4*cpus, 128) partitions and coalesce down, so 10x/100x data
    keeps per-task shuffle state bounded with no per-query override."""
    from multithreaded_map_reduce_library_spark.session import tune_existing

    tune_existing(spark)
    n = int(spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum"))
    assert n >= 128
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
