"""Pipeline batch 62: AUDIO multimodal — WAV (RIFF/PCM16) payload
fabrication, header parse, and per-frame energy extraction (VERDICT r2
item 8: the multimodal tier had image/video shapes but no audio).

Same oracle-replay discipline as the PNG roundtrip: the WAV payloads are
fabricated from embeddings with exact IEEE quantization
(floor(clamp(x)*32767+0.5) per sample), so DuckDB can recompute every
int16 sample — and therefore every frame energy — directly from the
embedding column, making the REAL decode kernel (RIFF chunk walk +
PCM16 reinterpret, operators/multimodal.py::wav_frame_energy)
value-hashable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    WAV_FRAME,
    WAV_SAMPLE_RATE,
    embeddings_as_wav_assets,
    wav_frame_energy,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DIM = 64  # embedding length == samples per asset


def _wav_energy_oracle() -> str:
    # int16 sample i (1-based list index): floor(clamp(x,-1,1)*32767+0.5)
    sample = (
        "CAST(FLOOR(LEAST(GREATEST(CAST(embedding[{i}] AS DOUBLE), -1.0), 1.0)"
        " * 32767.0 + 0.5) AS BIGINT)"
    )
    frames = []
    for f in range(_DIM // WAV_FRAME):
        terms = " + ".join(
            f"({sample.format(i=i + 1)} * {sample.format(i=i + 1)})"
            for f_i in [f]
            for i in range(f * WAV_FRAME, (f + 1) * WAV_FRAME)
        )
        frames.append(
            f"SELECT vec_id AS asset_id, {WAV_SAMPLE_RATE} AS sample_rate, "
            f"{_DIM} AS n_samples, {f} AS frame_idx, "
            f"CAST({terms} AS BIGINT) AS energy FROM embeddings"
        )
    return " UNION ALL ".join(frames)


@register(
    "multimodal_wav_energy",
    oracle=_wav_energy_oracle(),
    tags=("multimodal", "audio", "wav", "mapInPandas"),
)
def multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, end to end: embeddings quantize to int16 PCM
    JVM-side, wrap into byte-correct RIFF/WAVE containers in an Arrow
    pandas UDF, then the mapInPandas decode kernel PARSES the container
    back (chunk walk, fmt validation, PCM16 reinterpret) and emits the
    exact integer energy Σs² per 16-sample frame — the VAD/loudness
    front-end feature. The oracle recomputes every sample and energy
    from the embedding column, so any header/codec bug breaks the value
    hash (the audio twin of `multimodal_png_roundtrip`).

    Scale design: encode and decode are both map-side Arrow-batched
    stages over the binary column; output is 4 skinny integer rows per
    asset — at 100 TB of audio this is the standard scan -> decode ->
    features plan with zero shuffles and no driver involvement."""
    emb = load_table(spark, sf_dir, "embeddings")
    assets = embeddings_as_wav_assets(emb)
    return wav_frame_energy(assets, frame=WAV_FRAME)
