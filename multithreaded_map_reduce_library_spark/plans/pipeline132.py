"""Pipeline batch 132 (round 8): MULTI-SCAN SEQUENTIAL JPEG WITH RESTART
INTERVALS (§B.2.3 + §E.2.4) — VERDICT r7 item 4, the one raise that was
left inside an otherwise-supported crawl shape. DRI is legal in
multi-scan sequential streams; Ri counts MCUs PER SCAN, and in a
non-interleaved scan one MCU is one data unit (§B.2.3), so scan 1 (Y
alone) restarts every Ri Y blocks while scan 2 (Cb+Cr interleaved)
restarts every Ri chroma MCU positions. The decoder byte-aligns at each
boundary, sequence-checks RST0-7 (number resetting at every SOS), and
resets the DC predictors; the encoder emits the matching markers.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
image tier; this extends the driver-mandated multimodal superset.

Scale design: identical plan shape to every other JPEG tier — scan →
pandas-UDF encode → mapInPandas decode → tiny typed rows; pixels never
cross a shuffle. Restart markers additionally make each segment
independently decodable, the property the parallel-decode query exploits
for fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multithreaded_map_reduce_library_spark.plans.pipeline129 import COLOR420_ORACLE
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "multimodal_jpeg_multiscan_dri_color420",
    # Restart machinery cannot change a single coefficient — it only
    # re-aligns the entropy stream and resets DC predictors — so the
    # SAME closed-form color-chain oracle as the baseline, progressive,
    # and multi-scan roundtrips applies verbatim. A missed predictor
    # reset, a marker-sequence slip, or a wrong per-scan MCU cadence
    # (blocks vs MCUs in the non-interleaved scan) all break the hash.
    oracle=COLOR420_ORACLE,
    tags=(
        "multimodal",
        "image-decode",
        "jpeg",
        "multiscan-sequential",
        "restart-markers",
        "chroma-subsampling",
        "mapInPandas",
    ),
)
def multimodal_jpeg_multiscan_dri_color420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-scan sequential (§B.2.3) 4:2:0 roundtrip WITH DRI: the
    constant 16×16-macroblock color fixtures encoded as a 2-scan SOF0
    stream with restart interval 3 — Ri=3 divides neither scan 1's 64 Y
    blocks nor scan 2's 16 MCUs evenly, so the decode exercises RST0-7
    wraparound, the no-trailing-marker tail, byte re-alignment, and the
    per-scan restart-number reset — then decoded by the native
    multi-scan path and pinned to the baseline closed-form color
    oracle."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg420_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return decode_image_meta(
        embeddings_as_jpeg420_assets(emb, multiscan=True, restart_interval=3)
    )
