"""Round-4 operator invariants beyond oracle parity: properties that hold
for ANY input corpus, so they catch logic bugs the (single-dataset)
oracle comparison could coincidentally miss.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

from .conftest import SF_SMALL


def test_heaps_fit_bounds_and_totals(spark):
    q = all_queries()["heaps_law_vocab_growth"]
    row = q.fn(spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents")
    n_docs = docs.count()
    assert row["n_docs"] == n_docs
    # types can never exceed tokens; both positive for a non-empty corpus
    assert 0 < row["n_types"] <= row["n_tokens"]
    # Heaps exponent is a sublinear growth rate: 0 <= beta <= 1 for any
    # corpus scanned in a fixed order (V can't grow faster than n)
    assert 0 <= row["beta_e6"] <= 1_000_000
    # ln K recovers a positive K
    assert row["ln_k_e6"] > -20_000_000


def test_heaps_totals_match_direct_counts(spark):
    q = all_queries()["heaps_law_vocab_growth"]
    row = q.fn(spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[ \\t\\r\\n]"), lambda x: x != "")
        ).alias("tok")
    )
    assert row["n_tokens"] == toks.count()
    assert row["n_types"] == toks.distinct().count()


def test_prefix_sum_final_row_is_grand_total(spark):
    q = all_queries()["prefix_sum_distributed_revenue"]
    out = q.fn(spark, SF_SMALL)
    e = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"))
    )
    total = e.agg(F.sum("cents")).collect()[0][0]
    assert out.agg(F.max("cum_cents")).collect()[0][0] == total
    assert out.count() == e.count()


def test_prefix_sum_is_monotone_in_event_order(spark):
    q = all_queries()["prefix_sum_distributed_revenue"]
    out = q.fn(spark, SF_SMALL)
    e = load_table(spark, SF_SMALL, "events").filter(
        F.col("event_type") == "purchase"
    )
    joined = out.join(e.select("event_id", "ts", "value"), "event_id")
    rows = sorted(
        joined.collect(), key=lambda r: (r["ts"], r["event_id"])
    )
    prev = 0
    for r in rows:
        # purchase values are nonnegative -> running total never decreases
        assert r["cum_cents"] >= prev
        prev = r["cum_cents"]


def test_stream_wav_ingest_invariant_to_micro_batching(spark, tmp_path):
    """The streaming media-ingest decode is stateless, so its output must
    be identical whether the source drains in one micro-batch or one
    file at a time over a 4-chunk split source."""
    import os

    import duckdb

    q = all_queries()["stream_multimodal_wav_ingest"]
    base = sorted(tuple(r) for r in q.fn(spark, SF_SMALL).collect())

    d = tmp_path / "sf_split"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        os.symlink(f"{SF_SMALL}/{t}.parquet", d / f"{t}.parquet")
    emb_dir = d / "embeddings.parquet"
    emb_dir.mkdir()
    con = duckdb.connect()
    src = f"{SF_SMALL}/embeddings.parquet"
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{src}')").fetchone()[0]
    sz = (n + 3) // 4
    for i in range(4):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') LIMIT {sz} OFFSET {i * sz})"
            f" TO '{emb_dir}/chunk{i}.parquet' (FORMAT PARQUET)"
        )
    os.environ["SPARK_GRAFT_STREAM_MAXFILES"] = "1"
    try:
        split = sorted(tuple(r) for r in q.fn(spark, str(d)).collect())
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_MAXFILES", None)
    assert split == base
