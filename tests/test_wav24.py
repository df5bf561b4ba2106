"""Round-4 widened audio envelope: stereo 24-bit PCM round trip and the
raise boundary of the generalized kernel.

The decode kernel (`wav_pcm_frame_energy`) accepts PCM bits∈{16,24} ×
channels∈{1,2} and must raise — never emit wrong numbers — outside that
envelope. Hypothesis drives hand-built RIFF containers across the
boundary; the in-envelope property is checked against a pure-numpy
reference on the same bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    INT24_FULL_SCALE,
    WAV_FRAME,
    embeddings_as_wav_stereo24_assets,
    wav_pcm_frame_energy,
)
from multithreaded_map_reduce_library_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def _wav(fmt=1, channels=2, bits=24, n_blocks=16, sr=16_000, data=None):
    block = channels * bits // 8
    if data is None:
        data = bytes(block * n_blocks)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, fmt, channels, sr, sr * block, block, bits)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _decode(spark, payload):
    df = spark.createDataFrame([(1, payload)], "asset_id long, payload binary")
    return wav_pcm_frame_energy(df).collect()


def test_stereo24_roundtrip_matches_numpy(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").limit(16)
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    rows = wav_pcm_frame_energy(embeddings_as_wav_stereo24_assets(emb)).collect()
    assert len(rows) == 16 * 2 * 2  # 2 channels x 2 frames per asset
    for r in rows:
        v = np.asarray(vecs[r["asset_id"]], dtype=np.float64)
        q = np.floor(np.clip(v, -1.0, 1.0) * float(INT24_FULL_SCALE) + 0.5).astype(
            np.int64
        )
        ch = q[r["channel"] :: 2]
        w = ch[r["frame_idx"] * WAV_FRAME : (r["frame_idx"] + 1) * WAV_FRAME]
        assert r["energy"] == int((w * w).sum())
        assert r["n_samples"] == 32
        assert r["sample_rate"] == 16_000


def test_int24_sign_extension_exact(spark):
    # extremes and sign boundary: -full-scale, -1, 0, 1, +full-scale, and
    # the most-negative encodable int24
    samples = [-INT24_FULL_SCALE, -1, 0, 1, INT24_FULL_SCALE, -(1 << 23)]
    arr16 = np.asarray((samples * 3)[:WAV_FRAME], dtype="<i4")  # one full frame
    pcm16 = arr16.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    rows = _decode(spark, _wav(channels=1, bits=24, data=pcm16))
    expect = int((arr16.astype(np.int64) ** 2).sum())
    assert [r["energy"] for r in rows] == [expect]


@given(
    fmt=st.sampled_from([0, 3, 6, 7, 85]),
)
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_non_pcm_fmt_raises(spark, fmt):
    with pytest.raises(Exception, match="PCM only"):
        _decode(spark, _wav(fmt=fmt))


@given(
    bits=st.sampled_from([8, 12, 20, 32, 64]),
    channels=st.sampled_from([1, 2]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_unsupported_bit_depth_raises(spark, bits, channels):
    with pytest.raises(Exception, match="mono/stereo only"):
        _decode(spark, _wav(bits=bits, channels=channels))


@given(channels=st.sampled_from([0, 3, 4, 6]))
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_unsupported_channel_count_raises(spark, channels):
    with pytest.raises(Exception, match="mono/stereo only"):
        _decode(spark, _wav(channels=channels))


@given(cut=st.integers(min_value=1, max_value=5))
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_truncated_data_chunk_raises(spark, cut):
    # a data chunk that is not a multiple of block align (6) is truncation,
    # not trailing-partial-frame (which drops silently)
    data = bytes(6 * 4 - cut)
    with pytest.raises(Exception, match="block align"):
        _decode(spark, _wav(data=data))


def test_not_riff_raises(spark):
    with pytest.raises(Exception, match="not a RIFF/WAVE"):
        _decode(spark, b"\x00" * 64)


def test_trailing_partial_frame_drops(spark):
    # 20 mono 16-bit samples: one full 16-frame, 4 trailing samples drop
    arr = np.arange(20, dtype="<i2")
    rows = _decode(spark, _wav(channels=1, bits=16, data=arr.tobytes()))
    assert len(rows) == 1
    w = arr[:16].astype(np.int64)
    assert rows[0]["energy"] == int((w * w).sum())


# ---- IEEE float32 (fmt 3) envelope --------------------------------------


def _wav_f32(fmt=3, channels=1, bits=32, data=None, sr=16_000):
    block = channels * bits // 8
    if data is None:
        data = bytes(block * 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, fmt, channels, sr, sr * block, block, bits)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_float32_roundtrip_matches_numpy(spark):
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        embeddings_as_wav_float32_assets,
        wav_float32_frame_energy,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").limit(8)
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32)
            for r in emb.collect()}
    rows = wav_float32_frame_energy(embeddings_as_wav_float32_assets(emb)).collect()
    assert len(rows) == 8 * 4
    for r in rows:
        v = vecs[r["asset_id"]].astype(np.float64)
        q = np.floor(v * 1e6 + 0.5).astype(np.int64)
        w = q[r["frame_idx"] * WAV_FRAME : (r["frame_idx"] + 1) * WAV_FRAME]
        assert r["energy_q"] == int((w * w).sum())


def test_float32_decoder_rejects_pcm_and_odd_shapes(spark):
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        wav_float32_frame_energy,
    )

    def dec(payload):
        df = spark.createDataFrame([(1, payload)], "asset_id long, payload binary")
        return wav_float32_frame_energy(df).collect()

    with pytest.raises(Exception, match="fmt 3 only"):
        dec(_wav_f32(fmt=1))
    with pytest.raises(Exception, match="float32 mono only"):
        dec(_wav_f32(channels=2))
    with pytest.raises(Exception, match="float32 mono only"):
        dec(_wav_f32(bits=64))
    with pytest.raises(Exception, match="multiple of 4"):
        dec(_wav_f32(data=bytes(4 * 16 - 1)))
