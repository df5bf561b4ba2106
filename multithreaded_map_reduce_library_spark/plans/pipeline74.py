"""Pipeline batch 74 (round 4): WIDENED MEDIA ENVELOPES — stereo 24-bit
PCM WAV and Adam7-interlaced PNG, end to end.

Closes both remaining media honest edges called out in VERDICT r3. Audio:
the fabricate side now emits genuine RIFF/WAVE **stereo 24-bit** payloads
(interleaved 3-byte little-endian two's-complement frames, block align
6), and the decode side is a generalized chunk-walk kernel
(``operators/multimodal.py::wav_pcm_frame_energy``) accepting
bits ∈ {16,24} × channels ∈ {1,2} with loud raises outside that envelope.
Image: the stdlib PNG codec now decodes **Adam7 interlace** (method 1)
across its whole depth × color-type envelope (``functions/png.py``), and
the roundtrip here hashes a position-weighted checksum so the
de-interlace scatter is proven placement-exact, not just sum-exact.

Oracle discipline (same as pipeline62/63): every 24-bit sample is an
exact IEEE quantization of the embedding column
(``floor(clamp(x)*8388607 + 0.5)``), so DuckDB replays the entire
encode→pack→parse→sign-extend→frame→energy pipeline from the raw
embeddings — the hash proves the 3-byte round trip bit-exact.

Reference scope note: the reference library (mapreduce.h:44-83) has no
media path at all; this tier exists for the 100 TB training-data mandate
(multimodal columns as opaque binaries + typed features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    INT24_FULL_SCALE,
    WAV_FRAME,
    WAV_SAMPLE_RATE,
    embeddings_as_wav_assets,
    embeddings_as_wav_stereo24_assets,
    wav_pcm_frame_energy,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DIM = 64  # embedding length == interleaved samples per asset (32/channel)


@register(
    "multimodal_wav_stereo24_energy",
    oracle=f"""
        WITH s AS (
            SELECT vec_id AS asset_id,
                   CAST((i - 1) % 2 AS INTEGER) AS channel,
                   CAST(((i - 1) // 2) // {WAV_FRAME} AS INTEGER) AS frame_idx,
                   CAST(FLOOR(LEAST(GREATEST(CAST(list_extract(embedding, i) AS DOUBLE),
                                             -1.0), 1.0) * {float(INT24_FULL_SCALE)!r}
                              + 0.5) AS BIGINT) AS v
            FROM embeddings CROSS JOIN generate_series(1, {_DIM}) AS t(i)
        )
        SELECT asset_id,
               CAST({WAV_SAMPLE_RATE} AS INTEGER) AS sample_rate,
               channel,
               CAST({_DIM // 2} AS INTEGER) AS n_samples,
               frame_idx,
               CAST(SUM(v * v) AS BIGINT) AS energy
        FROM s
        GROUP BY asset_id, channel, frame_idx
    """,
    tags=("multimodal", "audio", "wav", "stereo", "24bit", "mapInPandas"),
    bench=True,
)
def multimodal_wav_stereo24_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stereo 24-bit audio round trip: embeddings → int24
    quantization → interleaved 3-byte PCM packing inside a byte-correct
    WAV container → generalized RIFF chunk-walk decode (sign-extended
    int24, de-interleaved by block align) → per-channel per-frame exact
    integer energy Σs². The oracle replays every sample from the
    embedding column, so a hash match proves the full 3-byte two's-
    complement round trip, not just the header plumbing.

    Scale design: identical to the mono16 path — Arrow-batched map-side
    encode and decode, 4 skinny integer rows per asset (2 channels × 2
    frames), zero shuffles, no driver involvement."""
    emb = load_table(spark, sf_dir, "embeddings")
    return wav_pcm_frame_energy(embeddings_as_wav_stereo24_assets(emb), frame=WAV_FRAME)


@register(
    "multimodal_png_adam7_roundtrip",
    oracle="""
        WITH px AS (
            SELECT vec_id AS asset_id, i,
                   CAST(floor(least(greatest(
                       (CAST(list_extract(embedding, i) AS DOUBLE) + 1.0) / 2.0,
                       0.0), 1.0) * 255.0) AS BIGINT) AS v
            FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
        )
        SELECT asset_id,
               CAST(8 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS channels,
               CAST(SUM(v) AS BIGINT) AS sum_px,
               CAST(SUM(v * i) AS BIGINT) AS wsum_px
        FROM px
        GROUP BY asset_id
    """,
    tags=("multimodal", "image-decode", "png", "adam7", "mapInPandas"),
)
def multimodal_png_adam7_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL **Adam7-interlaced** image decode, end to end: the same 8-bit
    grey quantization as ``multimodal_png_roundtrip``, but the pandas-UDF
    encoder emits interlace-method-1 PNGs (seven reduced images, each
    independently filtered) and the stdlib decoder de-interlaces them.
    The output adds a position-weighted checksum ``wsum_px = Σ v_k·k``
    over the row-major pixels (k = 1-based embedding index), which is
    permutation-SENSITIVE: a de-interlace that lands right pixel values
    at wrong pass offsets matches ``sum_px`` but breaks ``wsum_px`` —
    the hash proves the pass grid, per-pass unfiltering, and the
    scatter are position-exact.

    Scale design: identical to the sequential roundtrip — Arrow-batched
    map-side encode/decode, one skinny row per asset, zero shuffles."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_checksum,
        embeddings_as_png_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return decode_image_checksum(embeddings_as_png_assets(emb, interlaced=True))


@register(
    "multimodal_wav_envelope_parity",
    oracle=f"""
        WITH s AS (
            SELECT vec_id AS asset_id,
                   CAST((i - 1) // {WAV_FRAME} AS INTEGER) AS frame_idx,
                   CAST(FLOOR(LEAST(GREATEST(CAST(list_extract(embedding, i) AS DOUBLE),
                                             -1.0), 1.0) * 32767.0 + 0.5) AS BIGINT)
                       AS v16,
                   CAST(FLOOR(LEAST(GREATEST(CAST(list_extract(embedding, i) AS DOUBLE),
                                             -1.0), 1.0) * {float(INT24_FULL_SCALE)!r}
                              + 0.5) AS BIGINT) AS v24
            FROM embeddings CROSS JOIN generate_series(1, {_DIM}) AS t(i)
        )
        SELECT asset_id,
               CAST(SUM(v16 * v16) AS BIGINT) AS energy16,
               CAST(SUM(v24 * v24) AS BIGINT) AS energy24,
               CAST(COUNT(*) AS BIGINT) AS n_samples_total
        FROM s
        GROUP BY asset_id
    """,
    tags=("multimodal", "audio", "wav", "stereo", "24bit"),
)
def multimodal_wav_envelope_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-envelope decode parity audit: the SAME embedding decoded
    through BOTH containers — mono 16-bit and stereo 24-bit — with
    per-asset total energies side by side. Catches any drift between the
    two kernels' parse paths (a wrong sign extension or de-interleave
    shows up as an energy24 mismatch against the oracle's direct
    quantization; a regression in the mono path shows in energy16).

    Scale: two map-side decodes of the same skinny asset table, one
    per-asset aggregate each, broadcast-free equi-join on asset_id."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        wav_frame_energy,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    e16 = (
        wav_frame_energy(embeddings_as_wav_assets(emb), frame=WAV_FRAME)
        .groupBy("asset_id")
        .agg(F.sum("energy").alias("energy16"))
    )
    e24 = (
        wav_pcm_frame_energy(embeddings_as_wav_stereo24_assets(emb), frame=WAV_FRAME)
        .groupBy("asset_id")
        .agg(
            F.sum("energy").alias("energy24"),
            F.sum("n_samples").alias("_ns_sum"),
        )
    )
    # 4 rows/asset each carrying per-channel n_samples (32): their sum over
    # the 2x2 (channel, frame) rows is 128 = 2 * total interleaved samples.
    return e16.join(e24, "asset_id").select(
        "asset_id",
        "energy16",
        "energy24",
        (F.col("_ns_sum") / 2).cast("bigint").alias("n_samples_total"),
    )
