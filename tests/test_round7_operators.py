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


def test_initial_partitions_scale_with_input_size(spark):
    """SCALING_10X's measured knob is code now, and it scales with the
    DATA rather than being a constant: one AQE initial partition per
    16 MB of source parquet, floored at cpus (so sf0.001-0.1 keep the
    round-6 task counts exactly — a fixed 128 measured +20% aggregate
    at sf0.1) and growing past 128 at sf10 sizes where 32 fixed
    partitions measurably broke string-heavy shuffles."""
    from multithreaded_map_reduce_library_spark.session import (
        _cpus,
        scaled_initial_partitions,
    )

    small = scaled_initial_partitions(SF_SMALL)
    assert small == _cpus()  # tiny dirs: floor at core count
    # a synthetic 2.4 GB dir would give ~150; emulate via the cache
    from multithreaded_map_reduce_library_spark import session as S

    S._DIR_BYTES["/fake/sf10"] = 2400 << 20
    assert scaled_initial_partitions("/fake/sf10") == max(_cpus(), 150)
    S._DIR_BYTES["/fake/huge"] = 1 << 50
    assert scaled_initial_partitions("/fake/huge") == 4096  # capped
    del S._DIR_BYTES["/fake/sf10"], S._DIR_BYTES["/fake/huge"]
    # the registry wrapper pins it per query
    qs = all_queries()
    qs["wordcount"].fn(spark, SF_SMALL)
    n = int(spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum"))
    assert n == small
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
