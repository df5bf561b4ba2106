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
    assert 10 * 10000 <= out["median_value_e4"] <= 14 * 10000  # median unmoved by garbage
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


def test_temperature_mix_allocates_budget_exactly(spark):
    from multithreaded_map_reduce_library_spark.plans import pipeline16 as p16

    rows = _Q["corpus_temperature_mix"].fn(spark, SF_SMALL).collect()
    assert sum(r["alloc_tokens"] for r in rows) == p16._MIX_BUDGET
    # temperature flattening: smallest language's share of the budget
    # exceeds its raw token share
    tot_toks = sum(r["n_toks"] for r in rows)
    small = min(rows, key=lambda r: r["n_toks"])
    assert small["alloc_tokens"] / p16._MIX_BUDGET >= small["n_toks"] / tot_toks


def test_threshold_sweep_is_monotone(spark):
    rows = sorted(_Q["minhash_threshold_sweep"].fn(spark, SF_SMALL).collect(),
                  key=lambda r: r["t"])
    assert len(rows) == 4
    for a, b in zip(rows, rows[1:]):
        assert a["n_est_pos"] >= b["n_est_pos"]
        assert a["n_exact_pos"] >= b["n_exact_pos"]
    for r in rows:
        assert r["n_true_pos"] <= min(r["n_est_pos"], r["n_exact_pos"])
        assert r["n_pairs"] == rows[0]["n_pairs"]


def test_contrastive_pairs_structure(spark):
    from multithreaded_map_reduce_library_spark.plans import pipeline18 as p18

    rows = _Q["contrastive_training_pairs"].fn(spark, SF_SMALL).collect()
    assert rows
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    for r in rows:
        assert r["negative"] not in (r["anchor"], r["positive"])
        assert 0 <= r["negative"] < n_docs
        assert 1 <= r["slot"] <= p18._NEG_K
    # content-addressed: re-run is identical
    again = _Q["contrastive_training_pairs"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # each anchor contributes at most K negatives per positive
    from collections import Counter
    per = Counter((r["anchor"], r["positive"]) for r in rows)
    assert all(v <= p18._NEG_K for v in per.values())
