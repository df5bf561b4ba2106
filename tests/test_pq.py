"""Behavior tests for the product-quantization codebook."""

from __future__ import annotations

from multithreaded_map_reduce_library_spark.plans import pipeline15 as p15
from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

_Q = all_queries()


def test_pq_codes_cover_all_vectors_and_ranges(spark):
    rows = _Q["embedding_pq_codebook"].fn(spark, SF_SMALL).collect()
    total = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert len(rows) == total
    for r in rows:
        cs = [r[f"c{m}"] for m in range(p15._PQ_M)]
        assert all(0 <= c < p15._PQ_K for c in cs)
        assert r["code"] == sum(c * (p15._PQ_K ** m) for m, c in enumerate(cs))


def test_pq_codebook_is_discriminative(spark):
    """PQ is useless if every vector lands on one codeword: each
    subspace must use several codewords, and the packed code space must
    be well-populated relative to corpus size."""
    rows = _Q["embedding_pq_codebook"].fn(spark, SF_SMALL).collect()
    for m in range(p15._PQ_M):
        assert len({r[f"c{m}"] for r in rows}) >= 3, f"subspace {m} degenerate"
    distinct_codes = len({r["code"] for r in rows})
    assert distinct_codes >= min(len(rows) // 4, 16)


def test_adc_approximates_exact_ranking(spark):
    """ADC distances are approximations; assert the top-3 ADC neighbors
    overlap non-trivially with the exact cosine top-10 (coarse 8^4-code
    quantization can't match exact rank order, but it must not be
    random), and output shape invariants hold."""
    adc = _Q["ann_adc_pq"].fn(spark, SF_SMALL).collect()
    exact = _Q["knn_bruteforce_cosine"].fn(spark, SF_SMALL).collect()
    assert adc and len({r["q_id"] for r in adc}) >= 5
    by_q = {}
    for r in adc:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
        assert all(r["ad_e6"] >= 0 for r in rs)
    true10 = {(r["q_id"], r["n_id"]) for r in exact}
    got = {(r["q_id"], r["n_id"]) for r in adc}
    # knn_bruteforce returns top-5; any overlap >= 15% beats chance by far
    overlap = len(got & true10) / len(got)
    assert overlap >= 0.15, overlap


def test_ivfpq_probe_stays_in_cell_and_overlaps_exact(spark):
    """Composed IVF-PQ: every neighbor shares the query's coarse cell;
    the double approximation (cell restriction + PQ distances) must
    still overlap the exact cosine top-5 non-trivially."""
    out = _Q["ann_ivfpq"].fn(spark, SF_SMALL).collect()
    exact = _Q["knn_bruteforce_cosine"].fn(spark, SF_SMALL).collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], set()).add(r["cell"])
    assert all(len(c) == 1 for c in by_q.values())
    got = {(r["q_id"], r["n_id"]) for r in out}
    true5 = {(r["q_id"], r["n_id"]) for r in exact}
    assert len(got & true5) / len(got) >= 0.1


def test_pq_codes_match_independent_python_reference(spark):
    """Shared-nothing Python PQ: per 16-dim slice, run the same
    quantize -> 2x Lloyd (singleton init, (dist, cluster) tie-break)
    loop and compare every vector's code ids exactly."""
    import numpy as np

    emb = {r["vec_id"]: np.floor(np.array(r["embedding"], dtype=np.float64) * p15._KM_SCALE)
           for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()}

    def lloyd_assign(vecs, k, iters):
        cents = {j: (vecs[j].copy(), 1) for j in sorted(vecs) if j < k}
        assign = {}
        for _ in range(iters):
            assign = {}
            for vid, v in vecs.items():
                best = min(((float(np.sum((n * v - s) ** 2)) / (n * n), j)
                            for j, (s, n) in cents.items()))
                assign[vid] = best[1]
            cents = {}
            for vid, j in assign.items():
                s, n = cents.get(j, (np.zeros_like(vecs[vid]), 0))
                cents[j] = (s + vecs[vid], n + 1)
        return assign

    ref_codes = {}
    for m in range(p15._PQ_M):
        sub = {vid: v[m * p15._PQ_SUB:(m + 1) * p15._PQ_SUB] for vid, v in emb.items()}
        a = lloyd_assign(sub, p15._PQ_K, p15._PQ_ITERS)
        for vid, c in a.items():
            ref_codes.setdefault(vid, []).append(c)

    got = {r["vec_id"]: [r[f"c{m}"] for m in range(p15._PQ_M)]
           for r in _Q["embedding_pq_codebook"].fn(spark, SF_SMALL).collect()}
    assert got == ref_codes


def test_rerank_recall_at_least_matches_adc_ranking(spark):
    """Exact re-rank of the ADC shortlist must recover at least as much
    of the exact top-3 as raw ADC ranking does (stage 2 can only fix
    orderings inside the shortlist, never hurt them)."""
    rr = {(r["q_id"], r["n_id"])
          for r in _Q["ann_ivfpq_rerank"].fn(spark, SF_SMALL).collect()}
    adc_cell = {(r["q_id"], r["n_id"])
                for r in _Q["ann_ivfpq"].fn(spark, SF_SMALL).collect()}
    exact = _Q["knn_bruteforce_cosine"].fn(spark, SF_SMALL).collect()
    true3 = {(r["q_id"], r["n_id"]) for r in exact if r["rank"] <= 3}
    assert rr
    assert len(rr & true3) >= len(adc_cell & true3)
