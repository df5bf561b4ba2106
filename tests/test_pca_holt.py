"""Semantic tests for batch 19/20 operators — independent references
(numpy eigendecomposition, a plain-Python Holt loop), not just the
DuckDB parity the driver already checks."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.operators.pca import (
    gram_matrix_int,
    power_iteration_unit,
    top_component_unit,
)
from multithreaded_map_reduce_library_spark.plans.pipeline20 import (
    holt_linear_smoothing,
)
from multithreaded_map_reduce_library_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_power_iteration_matches_numpy_small():
    """On a tiny SPD matrix the power iteration must align with numpy's
    top eigenvector (up to the deterministic sign rule)."""
    # magnitudes comparable to a real quantized Gram (entries ~1e9):
    # the fixed 2^-48 scaling assumes corpus-sized sums, see operators/pca.py
    g = [
        (0, 0, 4 * 10**9),
        (0, 1, 10**9),
        (1, 0, 10**9),
        (1, 1, 2 * 10**9),
        (2, 2, 5 * 10**8),
    ]
    unit = power_iteration_unit(g, dim=3)
    m = np.zeros((3, 3))
    for i, j, v in g:
        m[i, j] = v
    w, v = np.linalg.eigh(m)
    top = v[:, np.argmax(w)]
    cos = abs(float(np.dot(unit, top)))
    assert cos > 0.999999, (unit, top.tolist())
    assert abs(float(np.linalg.norm(unit)) - 1.0) < 1e-12
    # sign rule: largest-|component| entry is positive
    best = int(np.argmax(np.abs(unit)))
    assert unit[best] > 0


def test_gram_matrix_is_exact_and_symmetric(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").limit(50)
    rows = {(r["i"], r["j"]): r["g"] for r in gram_matrix_int(emb).collect()}
    pdf = emb.select("embedding").toPandas()
    q = np.floor(np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 10000.0).astype(np.int64)
    ref = q.T @ q
    assert len(rows) == 64 * 64
    for (i, j), v in rows.items():
        assert v == ref[i, j], (i, j, v, int(ref[i, j]))
        assert rows[(j, i)] == v  # symmetry


def test_top_component_aligns_with_numpy_eig(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    unit = np.array(top_component_unit(emb))
    pdf = emb.select("embedding").toPandas()
    q = np.floor(np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 10000.0)
    gram = q.T @ q
    w, v = np.linalg.eigh(gram)
    top = v[:, np.argmax(w)]
    assert abs(float(np.dot(unit, top))) > 0.999, float(np.dot(unit, top))


def _holt_ref(xs, a=0.5, b=0.5):
    level, trend = xs[0], 0.0
    for x in xs[1:]:
        new_level = a * x + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        level = new_level
    return level, trend


def test_holt_matches_python_reference(spark):
    got = {
        r["user_id"]: (r["n_events"], r["level_e6"], r["trend_e6"], r["forecast_e6"])
        for r in holt_linear_smoothing(spark, SF_SMALL).collect()
    }
    e = load_table(spark, SF_SMALL, "events")
    series = {}
    for r in e.select("user_id", "ts", "event_id", "value").collect():
        series.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["value"]))
    assert set(got) == set(series)
    for uid, rows in series.items():
        xs = [v for _, _, v in sorted(rows)]
        level, trend = _holt_ref(xs)
        n, lr, tr, fr = got[uid]
        assert n == len(xs)
        import math as _m

        assert lr == _m.floor(level * 1e6 + 0.5)
        assert tr == _m.floor(trend * 1e6 + 0.5)
        assert fr == _m.floor((level + trend) * 1e6 + 0.5)


def test_quality_classifier_is_pure_map(spark):
    """The hashed classifier must plan with NO shuffle: a single scan,
    no Exchange node (the hashing trick's whole point)."""
    from multithreaded_map_reduce_library_spark.plans.pipeline19 import (
        quality_classifier_score,
    )

    df = quality_classifier_score(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    rows = df.collect()
    assert len(rows) == 500
    # score is the exact integer sum of md5-derived token weights
    some = [r for r in rows if r["n_tokens"] > 0][0]
    assert isinstance(some["score_milli"], int)
    assert some["keep_doc"] == (some["score_milli"] > 0)


def test_rrf_fuses_both_rankers(spark):
    from multithreaded_map_reduce_library_spark.plans.pipeline19 import (
        _RRF_K,
        hybrid_rrf_retrieval,
    )

    rows = hybrid_rrf_retrieval(spark, SF_SMALL).collect()
    assert len(rows) == 20
    # every fused score equals the recomputed reciprocal sum
    for r in rows:
        want = 0.0
        if r["bm25_rank"] is not None:
            want += 1.0 / (_RRF_K + r["bm25_rank"])
        if r["cos_rank"] is not None:
            want += 1.0 / (_RRF_K + r["cos_rank"])
        import math as _m

        assert r["rrf_e6"] == _m.floor(want * 1e6 + 0.5)
    # the list is sorted by fused score desc (ties by doc_id)
    scores = [r["rrf_e6"] for r in rows]
    assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(scores)


def test_semdedup_pairs_are_within_cell_and_above_threshold(spark):
    from multithreaded_map_reduce_library_spark.operators.similarity import (
        assign_ivf_cells,
    )
    from multithreaded_map_reduce_library_spark.plans.pipeline19 import (
        _SEMDEDUP_T,
        semdedup_within_cell,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    cells = {
        r["id"]: r["cell"] for r in assign_ivf_cells(emb, stride=50).collect()
    }
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    rows = semdedup_within_cell(spark, SF_SMALL).collect()
    assert rows, "expected at least one near-duplicate pair"
    for r in rows:
        assert r["id_keep"] < r["id_drop"]
        assert cells[r["id_keep"]] == cells[r["id_drop"]] == r["cell"]
        a, b = vecs[r["id_keep"]], vecs[r["id_drop"]]
        sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert sim >= _SEMDEDUP_T - 1e-9
        assert r["sim_e6"] == pytest.approx(sim * 1_000_000, abs=1.5)
