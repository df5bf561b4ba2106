"""Pipeline batch 66: video keyframe selection over fabricated RAWV
containers — the shot-boundary/frame-difference operator that upgrades
the video tier from "byte-offset sampling plumbing"
(multimodal_frame_sample) to a real per-frame analysis with a decoded
pixel kernel, same oracle-replay discipline as the audio/PNG paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    VIDEO_FRAMES,
    VIDEO_H,
    VIDEO_W,
    embeddings_as_video_assets,
    video_frame_deltas,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_PX = VIDEO_W * VIDEO_H  # 16 pixels per frame
_DIM = _PX * VIDEO_FRAMES  # 64 samples per asset


@register(
    "multimodal_keyframe_select",
    oracle=f"""
        WITH s AS (
            SELECT vec_id AS asset_id,
                   i,
                   CAST((i - 1) // {_PX} AS INTEGER) AS frame_idx,
                   (i - 1) % {_PX} AS px,
                   CAST(FLOOR(LEAST(GREATEST(CAST(list_extract(embedding, i) AS DOUBLE),
                                             -1.0), 1.0) * 32767.0 + 0.5) AS BIGINT) AS v
            FROM embeddings CROSS JOIN generate_series(1, {_DIM}) AS t(i)
        ),
        d AS (
            SELECT a.asset_id, a.frame_idx,
                   CAST(SUM(ABS(a.v - b.v)) AS BIGINT) AS l1_delta
            FROM s a
            JOIN s b ON b.asset_id = a.asset_id
                    AND b.frame_idx = a.frame_idx - 1 AND b.px = a.px
            WHERE a.frame_idx >= 1
            GROUP BY a.asset_id, a.frame_idx
        ),
        r AS (
            SELECT asset_id, frame_idx, l1_delta,
                   ROW_NUMBER() OVER (PARTITION BY asset_id
                                      ORDER BY l1_delta DESC, frame_idx) AS rk,
                   CAST(SUM(l1_delta) OVER (PARTITION BY asset_id) AS BIGINT)
                       AS total_delta
            FROM d
        )
        SELECT asset_id,
               CAST(frame_idx AS INTEGER) AS keyframe_idx,
               l1_delta AS max_delta,
               total_delta
        FROM r WHERE rk = 1
    """,
    tags=("multimodal", "video", "keyframe", "mapInPandas"),
)
def multimodal_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection over REAL decoded video: fabricate a RAWV
    container per embedding (4 frames of 4x4 int16 pixels, byte-real
    header), parse it back in the Arrow mapInPandas kernel
    (operators/multimodal.py::video_frame_deltas), and pick per asset
    the frame with the LARGEST exact-integer L1 delta vs its
    predecessor (ties -> earliest frame) — the frame-difference
    shot-boundary criterion every video sampling pipeline starts from.
    Output: the keyframe index, its delta, and the asset's total motion
    (Σ deltas). The oracle replays every pixel from the embedding
    column and the same argmax.

    Scale design: decode+differencing is map-side per asset (state = 2
    frames); the argmax is one window over the asset's 3 delta rows,
    partitioned by asset — no global sort, no shuffle beyond the
    per-asset grouping, unchanged at 100 TB with real codecs swapped
    into the same kernel signature."""
    emb = load_table(spark, sf_dir, "embeddings")
    deltas = video_frame_deltas(embeddings_as_video_assets(emb))
    w = Window.partitionBy("asset_id").orderBy(
        F.desc("l1_delta"), F.asc("frame_idx")
    )
    return (
        deltas.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "total_delta",
            F.sum("l1_delta").over(Window.partitionBy("asset_id")).cast("bigint"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "asset_id",
            F.col("frame_idx").alias("keyframe_idx"),
            F.col("l1_delta").alias("max_delta"),
            "total_delta",
        )
    )
