"""Pipeline batch 133 (round 9): RESTART INTERVALS INSIDE PROGRESSIVE
SCANS (§E.2.4 in an SOF2 stream) — VERDICT r8 item 3, the last raise in
a genuinely common crawl family (progressive JPEGs are ubiquitous on
the web, and §E.2.4 restart markers are legal in every scan type).

DRI applies per scan: the interleaved DC scans restart every Ri MCUs
(sum(hs*vs) data units per MCU), the non-interleaved AC band scans every
Ri data units. The decoder byte-aligns at each boundary, sequence-checks
RST0-7 (number resetting at every SOS), resets the DC predictors — and,
the progressive-specific subtlety, RESETS THE EOB RUN: an EOBn run may
not cross a restart segment, so the encoder flushes any pending run
(plus buffered refinement correction bits) before each boundary and the
decoder zeroes its run counter at each marker.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
image tier; this extends the driver-mandated multimodal superset.

Scale design: identical plan shape to every other JPEG tier — scan →
pandas-UDF encode → mapInPandas decode → tiny typed rows; pixels never
cross a shuffle. Restart markers additionally bound error propagation to
one restart segment, the property a crawl-ingest pipeline wants when a
single corrupt asset must not poison a whole decode batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multithreaded_map_reduce_library_spark.plans.pipeline129 import COLOR420_ORACLE
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "multimodal_jpeg_progressive_dri_color420",
    # Restart machinery cannot change a single coefficient — it only
    # re-aligns the entropy stream and resets DC predictors / EOB runs —
    # so the SAME closed-form color-chain oracle as the baseline,
    # progressive, and multi-scan roundtrips applies verbatim. A missed
    # EOB-run flush at a boundary, a marker-sequence slip, or a wrong
    # per-scan cadence (MCUs in the DC scans vs data units in the AC
    # scans) all break the hash.
    oracle=COLOR420_ORACLE,
    tags=(
        "multimodal",
        "image-decode",
        "jpeg",
        "progressive",
        "restart-markers",
        "chroma-subsampling",
        "mapInPandas",
    ),
)
def multimodal_jpeg_progressive_dri_color420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (SOF2) 4:2:0 roundtrip WITH DRI: the constant
    16×16-macroblock color fixtures encoded with the full spectral-
    selection + successive-approximation scan script and restart
    interval 3 — Ri=3 divides neither the 16 DC MCUs, nor scan-wise the
    64 Y / 16 chroma AC data units, so the decode exercises RST0-7
    wraparound, the no-trailing-marker tail, byte re-alignment, the
    per-SOS restart-number reset, AND the EOB-run reset at boundaries
    (constant macroblocks make every AC block empty, so EOBn runs press
    against every restart boundary in every AC scan) — then decoded by
    the native progressive path and pinned to the baseline closed-form
    color oracle."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg420_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return decode_image_meta(
        embeddings_as_jpeg420_assets(emb, progressive=True, restart_interval=3)
    )
