"""Pipeline batch 100 (round 4): IMAGE RESIZE — the multimodal tier's
missing preprocessing op. The brief's multimodal contract is decode /
feature-extract / RESIZE / frame-sample; decode (PNG codec family),
features, and frame sampling are registered — this adds the resize leg
as an exact 2x box downscale over REAL decoded PNG bytes.

Same discipline as ``multimodal_hist_equalization`` (pipeline86):
fabricate genuine PNG payloads from the embedding grid, run the stdlib
decoder, do the transform in exact integers, and emit checksums the
DuckDB oracle recomputes straight from the embedding column — any codec,
layout, or averaging bug breaks the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    embeddings_as_png_assets,
    image_downscale2,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_W = 8  # embeddings_as_png_assets grid: 8x8 grayscale

#: grayscale quantization — must match embeddings_as_png_assets exactly
_PX = (
    "CAST(FLOOR(LEAST(GREATEST((CAST(list_extract(embedding, i) AS DOUBLE) + 1.0)"
    " / 2.0, 0.0), 1.0) * 255.0) AS BIGINT)"
)


@register(
    "multimodal_png_downscale2",
    oracle=f"""
        WITH px AS (
            SELECT vec_id, i, {_PX} AS p
            FROM embeddings CROSS JOIN generate_series(1, {_W * _W}) AS t(i)
        ),
        blocks AS (
            SELECT vec_id,
                   ((i - 1) // {_W} // 2) * {_W // 2} + ((i - 1) % {_W}) // 2 AS k,
                   CAST(SUM(p) AS BIGINT) AS blk
            FROM px GROUP BY vec_id, k
        ),
        ds AS (
            SELECT vec_id, k, (blk + 2) // 4 AS v FROM blocks
        )
        SELECT vec_id AS asset_id,
               CAST({_W // 2} AS INTEGER) AS out_w,
               CAST({_W // 2} AS INTEGER) AS out_h,
               CAST(SUM(v) AS BIGINT) AS ds_sum,
               CAST(SUM(v * (k + 1)) AS BIGINT) AS ds_wsum
        FROM ds GROUP BY vec_id
    """,
    tags=("multimodal", "image", "png", "resize", "mapInPandas", "preprocessing"),
)
def multimodal_png_downscale2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2x box downscale over REAL PNG bytes: fabricate genuine 8x8
    grayscale PNGs from the embedding grid, decode with the stdlib
    codec, average each 2x2 block as the half-up integer (a+b+c+d+2)//4,
    and emit the 4x4 result's exact sum and position-weighted checksum.
    The oracle recomputes block membership (row-major index → block
    index), the averages, and both checksums directly from the embedding
    column — a transposed axis, off-by-one block boundary, or rounding
    drift breaks the hash. Resize is the multimodal contract's fourth
    leg (decode / features / resize / frame-sample), now covered.

    Scale design: encode and decode+downscale are per-asset Arrow
    kernels (mapInPandas) — map-side, zero shuffles, one skinny row per
    asset. At 100 TB this is the exact plan shape of a thumbnail /
    patch-pyramid ingestion pass."""
    assets = embeddings_as_png_assets(load_table(spark, sf_dir, "embeddings"))
    return image_downscale2(assets)
