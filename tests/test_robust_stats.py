"""Behavior tests for pipeline-11: MAD robustness, normalization
accounting, and split-assignment stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

_Q = all_queries()


def test_mad_is_robust_to_injected_outliers(spark, tmp_path):
    """The defining property: corrupt values must NOT move the
    median/MAD threshold materially — inject 5% garbage at 1000x and the
    clean points still aren't flagged."""
    rows = [(i, "2024-01-01 00:00:00", i % 7, "click", float(10 + i % 5), "{}")
            for i in range(95)]
    rows += [(100 + i, "2024-01-01 00:00:00", 1, "click", 10000.0, "{}") for i in range(5)]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = _Q["events_mad_outliers"].fn(spark, str(tmp_path)).collect()[0]
    assert out["n"] == 100
    assert 10 <= out["median_value"] <= 14          # median unmoved by garbage
    assert out["n_outliers"] == 5                   # exactly the garbage flagged


def test_normalization_strips_markup(spark, tmp_path):
    rows = [(1, "Hello,   WORLD!! <b>tag</b>", "en", "w", 1)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = _Q["text_normalization_stats"].fn(spark, str(tmp_path)).collect()[0]
    # normalized: "hello world b tag b" -> 5 tokens, shorter than raw
    assert r["n_tokens_norm"] == 5
    assert r["norm_len"] < r["raw_len"]
    assert r["chars_removed"] == r["raw_len"] - r["norm_len"]


def test_split_assignment_proportions_and_stability(spark):
    out = _Q["dataset_split_assignment"].fn(spark, SF_SMALL)
    rows = out.collect()
    tot = sum(r["n_docs"] for r in rows)
    train = sum(r["n_docs"] for r in rows if r["split"] == "train")
    # 96% +- generous tolerance at tiny SF
    assert 0.80 < train / tot <= 1.0
    # content-addressed: a second run assigns identically
    again = _Q["dataset_split_assignment"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # every (lang, split) pair appears at most once
    assert len({(r["lang"], r["split"]) for r in rows}) == len(rows)
