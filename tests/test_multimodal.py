from __future__ import annotations

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    documents_as_assets,
    extract_features,
    frame_sample,
)
from multithreaded_map_reduce_library_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_feature_extraction_runs_and_is_deterministic(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    assets = documents_as_assets(docs)
    f1 = {r["asset_id"]: (r["payload_md5"], r["feat_l2"]) for r in extract_features(assets).collect()}
    f2 = {r["asset_id"]: (r["payload_md5"], r["feat_l2"]) for r in extract_features(assets).collect()}
    assert f1 == f2
    assert len(f1) == 20
    assert extract_features(assets).schema == FEATURE_SCHEMA


def test_feature_values_shape(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    rows = extract_features(documents_as_assets(docs)).collect()
    for r in rows:
        assert r["feat_dim"] == 64  # stub decoder yields 8x8
        assert r["n_bytes"] > 0
        assert float(r["feat_l2"]) > 0


def test_frame_sample_offsets(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(3)
    assets = documents_as_assets(docs)
    rows = frame_sample(assets, every_n_bytes=100).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append((r["frame_idx"], r["byte_offset"]))
    for frames in by_asset.values():
        idxs = [i for i, _ in sorted(frames)]
        offs = [o for _, o in sorted(frames)]
        assert idxs == list(range(len(frames)))
        assert offs == [i * 100 for i in range(len(frames))]
