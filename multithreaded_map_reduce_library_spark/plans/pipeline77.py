"""Pipeline batch 77 (round 4): IMAGE SHARPNESS + AUDIO TONE-BIN — two
all-integer signal-analysis features over REAL decoded media bytes.

Both queries extend the multimodal tier past geometry/energy checksums
into the analysis features a training-data pipeline actually filters on:

* ``multimodal_sobel_edge_energy`` — Sobel |gx|+|gy| gradient energy over
  the decoded PNG grid: the standard sharpness/blur screen applied before
  an image lands in a training corpus (blurry/flat assets score low).
* ``multimodal_wav_quadrature`` — the DFT bin at k = N/4 computed as
  exact integer quadrature sums (cos/sin at fs/4 take only {1,0,-1}):
  the integer core of narrowband tone detection, float-free end to end.

Oracle strategy is the established multimodal replay: the payloads are
fabricated from the embedding column via exact IEEE expressions
(operators/multimodal.py:197,415), so DuckDB re-derives the pixel / PCM
grids from ``embeddings`` and replays the identical integer arithmetic.
Reference parity anchor: the reference engine has no media tier at all
(reference mapreduce.h:44-83 is a word-count API); this family is part of
the training-data superset the driver mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    embeddings_as_png_assets,
    embeddings_as_wav_assets,
    image_sobel_energy,
    wav_quadrature_energy,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DIM = 64
_W = 8

#: grayscale quantization — must match embeddings_as_png_assets exactly
_PX = (
    "CAST(FLOOR(LEAST(GREATEST((CAST(x AS DOUBLE) + 1.0) / 2.0, 0.0), 1.0)"
    " * 255.0) AS BIGINT)"
)


@register(
    "multimodal_sobel_edge_energy",
    oracle=f"""
        WITH p AS (
            SELECT vec_id,
                   list_transform(embedding, x -> {_PX}) AS px
            FROM embeddings
        ), g AS (
            SELECT vec_id,
                   ABS(-px[(r-1)*{_W} + c]     + px[(r-1)*{_W} + c + 2]
                       - 2*px[r*{_W} + c]      + 2*px[r*{_W} + c + 2]
                       - px[(r+1)*{_W} + c]    + px[(r+1)*{_W} + c + 2])
                 + ABS(-px[(r-1)*{_W} + c] - 2*px[(r-1)*{_W} + c + 1] - px[(r-1)*{_W} + c + 2]
                       + px[(r+1)*{_W} + c] + 2*px[(r+1)*{_W} + c + 1] + px[(r+1)*{_W} + c + 2]
                   ) AS gmag
            FROM p
            CROSS JOIN generate_series(1, {_W - 2}) AS t(r)
            CROSS JOIN generate_series(1, {_W - 2}) AS u(c)
        )
        SELECT vec_id AS asset_id,
               CAST({_W} AS INTEGER) AS width,
               CAST({_DIM // _W} AS INTEGER) AS height,
               CAST(SUM(gmag) AS BIGINT) AS edge_energy,
               CAST(MAX(gmag) AS BIGINT) AS edge_max
        FROM g
        GROUP BY vec_id
    """,
    tags=("multimodal", "image", "png", "sobel", "mapInPandas", "quality"),
    bench=True,
)
def multimodal_sobel_edge_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image sharpness screen over REAL PNG bytes: fabricate genuine PNG
    payloads from the embedding grid, decode them with the stdlib codec,
    and convolve with the 3x3 Sobel kernels — emitting the exact integer
    L1 gradient energy and peak gradient per asset, the features a
    blur/flatness quality filter thresholds on. The oracle replays the
    identical convolution in SQL from the same quantized pixel grid, so
    a decoder that lands one pixel wrong breaks the hash.

    Scale design: encode and decode+convolve are both per-asset Arrow
    kernels (mapInPandas) — map-side only, zero shuffles, one skinny
    integer row per asset; at 100 TB this tier runs embarrassingly
    parallel over the binary-column scan."""
    assets = embeddings_as_png_assets(load_table(spark, sf_dir, "embeddings"))
    return image_sobel_energy(assets)


@register(
    "multimodal_wav_quadrature",
    oracle=f"""
        WITH s AS (
            SELECT vec_id,
                   i - 1 AS n,
                   CAST(FLOOR(LEAST(GREATEST(CAST(list_extract(embedding, i) AS DOUBLE),
                                             -1.0), 1.0) * 32767.0 + 0.5) AS BIGINT) AS v
            FROM embeddings CROSS JOIN generate_series(1, {_DIM}) AS t(i)
        ), q AS (
            SELECT vec_id,
                   CAST(SUM(CASE WHEN n % 4 = 0 THEN v
                                 WHEN n % 4 = 2 THEN -v ELSE 0 END) AS BIGINT) AS re_q,
                   CAST(SUM(CASE WHEN n % 4 = 3 THEN v
                                 WHEN n % 4 = 1 THEN -v ELSE 0 END) AS BIGINT) AS im_q,
                   CAST(SUM(v * v) AS BIGINT) AS energy
            FROM s GROUP BY vec_id
        )
        SELECT vec_id AS asset_id,
               CAST({_DIM} AS INTEGER) AS n_samples,
               re_q, im_q,
               CAST(re_q * re_q + im_q * im_q AS BIGINT) AS power_q,
               energy
        FROM q
    """,
    tags=("multimodal", "audio", "wav", "dft", "goertzel", "mapInPandas"),
)
def multimodal_wav_quadrature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrowband tone energy over REAL WAV bytes: fabricate PCM16 WAV
    payloads, RIFF-parse them, and evaluate the DFT bin at k = N/4 where
    the twiddle factors are exactly {1, 0, -1} — so the bin's re/im parts
    are integer quadrature sums and the bin power re²+im² is an exact
    BIGINT, replayed bit-for-bit by the SQL oracle from the same samples.
    The float-free core of tone detection / narrowband monitoring.

    Scale design: per-asset Arrow kernel over the binary scan, map-side
    only, no shuffle; one row per asset out."""
    assets = embeddings_as_wav_assets(load_table(spark, sf_dir, "embeddings"))
    return wav_quadrature_energy(assets)
