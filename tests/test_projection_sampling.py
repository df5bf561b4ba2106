"""Property tests for the pipeline-9 operators (JL projection, weighted
reservoir sampling) and an executable demonstration that Spark's runtime
Bloom-filter join pruning — the 100 TB semi-join pushdown — activates
under the documented configuration."""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans import pipeline9 as p9
from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

_Q = all_queries()


def test_jl_projection_preserves_pairwise_distance(spark):
    """The JL guarantee, empirically: for sampled pairs, the projected
    squared distance is within the expected ~1/sqrt(16) relative
    distortion band (checked loosely at 3 sigma)."""
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").limit(20).collect()
    }
    proj = {
        r["vec_id"]: [int(v) / 1e6 for v in r["proj_e6"].split(",")]
        for r in _Q["jl_random_projection"].fn(spark, SF_SMALL).collect()
    }
    ids = sorted(emb)[:20]
    ratios = []
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d_in = sum((x - y) ** 2 for x, y in zip(emb[a], emb[b]))
            d_out = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            if d_in > 0:
                ratios.append(d_out / d_in)
    assert ratios
    mean = sum(ratios) / len(ratios)
    # E[ratio]=1; sd ~ sqrt(2/k)=0.35 per pair, tighter on the mean.
    assert 0.6 < mean < 1.4, mean
    assert all(0.05 < r < 5.0 for r in ratios), (min(ratios), max(ratios))


def test_jl_sign_matrix_deterministic():
    assert p9._jl_signs() == p9._SIGNS
    flat = [v for row in p9._SIGNS for v in row]
    assert set(flat) == {1.0, -1.0}
    # balanced-ish: md5 bits are unbiased
    assert 0.35 < flat.count(1.0) / len(flat) < 0.65


def test_weighted_reservoir_exactly_k_per_group(spark):
    out = _Q["weighted_reservoir_sample_docs"].fn(spark, SF_SMALL)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(p9._WRS_K, avail[lang]), (lang, n, avail[lang])


def test_weighted_reservoir_favors_heavy_docs(spark, tmp_path):
    """Bias check on a constructed corpus: one doc is 1000x heavier than
    999 featherweights — A-ES must select it (P[miss] ~ (1-1000/1999)^5
    per trial is non-trivial, so use a margin: heavy doc must rank in the
    sample; with w=1000 vs total ~2000 its inclusion probability across
    the 5 slots is > 0.96)."""
    rows = [(i, "x", "en", "w", 1) for i in range(999)] + [(999, "x", "en", "w", 100000)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = _Q["weighted_reservoir_sample_docs"].fn(spark, str(tmp_path)).collect()
    assert any(r["doc_id"] == 999 for r in out), out


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    return buf.getvalue()


def test_runtime_bloom_filter_join_pruning(spark):
    """The scale technique for selective dim -> huge fact joins: Spark
    injects a bloom_filter_agg on the dimension side and a might_contain
    predicate on the fact scan, cutting shuffled fact rows before the
    join. Local thresholds are tuned to activate it on test data (at
    100 TB the defaults — 10 MB creation side, 10 GB application side —
    activate on their own); broadcast is disabled because broadcast
    joins already prune without a bloom filter."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = (
            spark.read.parquet(f"{SF_SMALL}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
        )
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = _plan(j).lower()
        assert "bloomfilter" in plan or "might_contain" in plan, plan[:2000]
        rows = j.collect()
        assert rows and rows[0]["n"] > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_jl_projection_matches_exact_python_fold(spark):
    """Bit-exact cross-check against a shared-nothing Python
    implementation of the same left fold (0.0 seed, index order, 0.25
    scale): the rounded outputs must be IDENTICAL, not just close —
    the projection contains no libm, so any difference is a real fold
    or sign-matrix bug."""
    emb = {r["vec_id"]: r["embedding"]
           for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()}
    got = {r["vec_id"]: [int(v) for v in r["proj_e6"].split(",")]
           for r in _Q["jl_random_projection"].fn(spark, SF_SMALL).collect()}
    assert set(got) == set(emb)
    for vid, proj in got.items():
        v = emb[vid]
        for j, out in enumerate(proj):
            acc = 0.0
            for i in range(64):
                acc = acc + float(v[i]) * p9._SIGNS[j][i]
            ref = math.floor(0.25 * acc * 1e6 + 0.5)
            assert out == ref, (vid, j, out, ref)
