"""The conf-pin cache's healing canary (code-review r8, widened ADVICE r8):
an OUTSIDE caller mutating ANY pinned conf behind the cache's back must be
re-pinned within a bounded number of tune_existing calls, not only when it
touches the session timezone."""

from __future__ import annotations

from multithreaded_map_reduce_library_spark.session import _conf_cache, tune_existing


def test_canary_heals_timezone_immediately(spark):
    tune_existing(spark)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    tune_existing(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_canary_heals_any_pinned_key_within_cache_len_calls(spark):
    """Round-robin canary: a behind-the-back mutation of a NON-timezone
    pin (here the multipleWatermarkPolicy — result-critical for multi-
    watermark streams) is detected and re-pinned within len(cache)
    calls."""
    tune_existing(spark)
    key = "spark.sql.streaming.multipleWatermarkPolicy"
    spark.conf.set(key, "max")
    n = len(_conf_cache(spark)) + 1
    for _ in range(n):
        tune_existing(spark)
        if spark.conf.get(key) == "min":
            break
    assert spark.conf.get(key) == "min"


def test_repin_restores_each_plans_own_pins(spark):
    """VERDICT r8 item 4: a consumer that builds several registered
    plans before executing any must be able to re-apply each plan's own
    perf pins at execution time — otherwise all run under the LAST
    build's Arrow batch / initial-partition values."""
    from multithreaded_map_reduce_library_spark.plans.registry import all_queries
    from multithreaded_map_reduce_library_spark.session import repin
    from tests.conftest import SF_SMALL

    qs = all_queries()
    fat = next(q for q in qs.values() if "image-decode" in q.tags)
    skinny = next(q for q in qs.values() if not set(q.tags) & {"image", "image-decode", "png", "jpeg", "video", "keyframe", "frame-sample"})
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    df_fat = fat.fn(spark, SF_SMALL)
    df_skinny = skinny.fn(spark, SF_SMALL)  # last build: default pin
    assert df_fat._mtmrl_exec_pins[key] == "2048"
    assert df_skinny._mtmrl_exec_pins[key] == "10000"
    assert spark.conf.get(key) == "10000"  # fat plan would mis-run now
    repin(df_fat)
    assert spark.conf.get(key) == "2048"  # its own pin back in force
    repin(df_skinny)
    assert spark.conf.get(key) == "10000"
    # and repin is harmless on a DataFrame that never saw the registry
    repin(spark.range(3))


def test_canary_noop_when_nothing_mutated(spark):
    """Healing never disturbs a clean cache: repeated calls keep all pins
    and the cache populated (the cheap path)."""
    tune_existing(spark)
    before = dict(_conf_cache(spark))
    for _ in range(3):
        tune_existing(spark)
    assert _conf_cache(spark) == before
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
