"""Pipeline batch 129 (round 6): PROGRESSIVE JPEG (SOF2) — the decode
path real-world image crawls need most (VERDICT r5 item 5), implemented
from scratch in functions/jpeg.py (T.81 Annex G: spectral selection +
successive approximation, EOBn run coding, AC refinement correction
bits) under the same oracle-replay discipline as the baseline tier:

* ``multimodal_jpeg_progressive_roundtrip`` — the per-block-constant
  grey fixtures of ``multimodal_jpeg_roundtrip``, encoded PROGRESSIVE
  (6-scan script: DC at Al=1, AC bands 1-5/6-63 at Al=2, refinements to
  Al=0) and decoded by the multi-scan path. Because every scan refines
  to Al=0, the accumulated coefficients equal the baseline encoder's
  exactly, so the SAME closed-form integer DC oracle applies — any
  EOBRUN, refinement-bit, band-geometry, or scan-ordering bug breaks
  the hash.
* ``multimodal_jpeg_progressive_color420`` — the color 4:2:0 macroblock
  fixtures encoded progressive (interleaved DC scan over subsampled
  components + per-component non-interleaved AC scans on their §A.2.2
  block grids), same full-color-chain oracle as
  ``multimodal_jpeg420_roundtrip``.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
image tier; these extend the driver-mandated multimodal superset.

Scale design: identical plan shape to the baseline tier — scan →
pandas-UDF encode → mapInPandas decode → tiny typed rows; pixels never
cross a shuffle. Progressive decode costs one coefficient-array pass per
scan (6 Huffman walks instead of 1) but stays per-asset Arrow-batch
work, embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multithreaded_map_reduce_library_spark.plans.pipeline127 import (
    _duck_block_sum,
    _duck_recon,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "multimodal_jpeg_progressive_roundtrip",
    oracle=f"""
        SELECT vec_id AS asset_id,
               CAST(64 AS INTEGER) AS width,
               CAST(64 AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS channels,
               {_duck_block_sum(16)} AS sum_px
        FROM embeddings
    """,
    tags=("multimodal", "image-decode", "jpeg", "progressive", "mapInPandas"),
    bench=True,
)
def multimodal_jpeg_progressive_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG decode, end to end: the same per-block-
    constant grey fixtures as the baseline roundtrip, but encoded with
    the 6-scan Annex G script and decoded by the multi-scan coefficient
    accumulator. A fully-refined progressive stream carries EXACTLY the
    baseline encoder's quantized coefficients, so the closed-form
    integer DC oracle is unchanged — the hash pins that six partial
    scans (DC diff + refinement bit, AC first with EOBn runs, AC
    refinement with buffered correction bits) reassemble to the same
    pixels as one sequential scan."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return decode_image_meta(embeddings_as_jpeg_assets(emb, progressive=True))


#: The full color-4:2:0 reconstruction oracle (BT.601 forward, two
#: quant tables, box-mean subsample, DC-only DCT, replication upsample,
#: BT.601 inverse) — shared VERBATIM by the progressive (pipeline129)
#: and multi-scan sequential (pipeline131) roundtrips: both carry
#: exactly the baseline encoder's quantized coefficients, so one
#: closed-form SQL replay pins all three decode paths.
COLOR420_ORACLE = f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(FLOOR(LEAST(GREATEST((x + 1.0) / 2.0, 0.0), 1.0)
                                       * 255.0) AS BIGINT)) AS qv
            FROM embeddings
        ),
        mb AS (
            SELECT vec_id,
                   qv[3 * i.g + 1] AS r, qv[3 * i.g + 2] AS g, qv[3 * i.g + 3] AS b
            FROM q CROSS JOIN generate_series(0, 15) AS i(g)
        ),
        -- e0 literals force DOUBLE (see multimodal_jpeg420_roundtrip)
        ycc AS (
            SELECT vec_id,
                LEAST(GREATEST(CAST(FLOOR(0.299e0*r + 0.587e0*g + 0.114e0*b
                                          + 0.5e0) AS BIGINT), 0), 255) AS y,
                LEAST(GREATEST(CAST(FLOOR(-0.168736e0*r - 0.331264e0*g + 0.5e0*b
                                          + 128.0e0 + 0.5e0) AS BIGINT), 0), 255) AS cb,
                LEAST(GREATEST(CAST(FLOOR(0.5e0*r - 0.418688e0*g - 0.081312e0*b
                                          + 128.0e0 + 0.5e0) AS BIGINT), 0), 255) AS cr
            FROM mb
        ),
        rec AS (
            SELECT vec_id,
                   {_duck_recon("y", 16)} AS y2,
                   {_duck_recon("cb", 17)} AS cb2,
                   {_duck_recon("cr", 17)} AS cr2
            FROM ycc
        ),
        rgb AS (
            SELECT vec_id,
                LEAST(GREATEST(CAST(FLOOR(y2 + 1.402e0*(cr2 - 128.0e0) + 0.5e0)
                                    AS BIGINT), 0), 255) AS r2,
                LEAST(GREATEST(CAST(FLOOR(y2 - 0.344136e0*(cb2 - 128.0e0)
                                          - 0.714136e0*(cr2 - 128.0e0) + 0.5e0)
                                    AS BIGINT), 0), 255) AS g2,
                LEAST(GREATEST(CAST(FLOOR(y2 + 1.772e0*(cb2 - 128.0e0) + 0.5e0)
                                    AS BIGINT), 0), 255) AS b2
            FROM rec
        )
        SELECT vec_id AS asset_id,
               CAST(64 AS INTEGER) AS width,
               CAST(64 AS INTEGER) AS height,
               CAST(3 AS INTEGER) AS channels,
               CAST(SUM(256 * (r2 + g2 + b2)) AS BIGINT) AS sum_px
        FROM rgb GROUP BY vec_id
    """


@register(
    "multimodal_jpeg_progressive_color420",
    oracle=COLOR420_ORACLE,
    tags=(
        "multimodal",
        "image-decode",
        "jpeg",
        "progressive",
        "chroma-subsampling",
        "mapInPandas",
    ),
)
def multimodal_jpeg_progressive_color420(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COLOR 4:2:0 progressive roundtrip — the web's dominant crawl
    format (progressive SOF2 + subsampled chroma): constant 16×16
    macroblock fixtures encoded with an interleaved DC scan over the
    subsampled components plus per-component non-interleaved AC scans
    (each on its own §A.2.2 block grid — a luma grid 4× the chroma
    grids), decoded by the multi-scan accumulator with replication
    upsampling and the BT.601 inverse. The oracle replays the identical
    full color chain as the baseline 4:2:0 roundtrip; any per-component
    scan-geometry or cross-scan state bug breaks the hash."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg420_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return decode_image_meta(embeddings_as_jpeg420_assets(emb, progressive=True))
