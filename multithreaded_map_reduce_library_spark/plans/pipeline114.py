"""Pipeline batch 114 (round 4): G.711 µ-LAW AUDIO — the companded-
telephony leg of the real-codec surface (PCM16, IEEE-float32, and
stereo/24-bit WAV are already oracle-hashed; µ-law adds the first
LOSSY audio codec, with the loss itself value-hashed):

``multimodal_wav_ulaw_roundtrip`` — embeddings quantize to int16,
µ-law COMPRESS to one byte per sample (integer-only companding:
m = min(|s|,32635)+132, e = msb(m)−7, mant = (m>>(e+3))&15,
byte = ~(sign|e<<4|mant)), wrap in a byte-correct fmt-code-7 RIFF
container; the mapInPandas kernel then PARSES the container, EXPANDS
each byte back to int16 per the G.711 formula, and emits per-frame
decoded energy plus the exact quantization-error energy against the
original samples. The DuckDB oracle replays compress→expand directly
from the embedding column (msb via length(bin()) — no libm), so the
lossy roundtrip is bit-exact cross-engine.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no multimodal tier; this extends the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    embeddings_as_ulaw_wav_assets,
    wav_ulaw_roundtrip_energy,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DIM = 64


@register(
    "multimodal_wav_ulaw_roundtrip",
    oracle=f"""
        WITH s AS (
            SELECT vec_id, CAST(u.i AS BIGINT) AS i,
                   CAST(FLOOR(LEAST(GREATEST(
                       CAST(embedding[CAST(u.i AS INTEGER)] AS DOUBLE),
                       -1.0), 1.0) * 32767.0 + 0.5) AS BIGINT) AS s16
            FROM embeddings, UNNEST(range(1, {_DIM + 1})) AS u(i)
        ),
        comp AS (
            SELECT vec_id, i, s16, LEAST(ABS(s16), 32635) + 132 AS m
            FROM s
        ),
        expo AS (
            SELECT vec_id, i, s16, m,
                   CAST(length(bin(m)) - 1 - 7 AS BIGINT) AS e
            FROM comp
        ),
        dec AS (
            SELECT vec_id, CAST((i - 1) // 16 AS INTEGER) AS frame_idx, s16,
                   CASE WHEN s16 < 0 THEN
                        -(((((m >> CAST(e + 3 AS INTEGER)) & 15) * 8 + 132)
                           << CAST(e AS INTEGER)) - 132)
                   ELSE
                        ((((m >> CAST(e + 3 AS INTEGER)) & 15) * 8 + 132)
                         << CAST(e AS INTEGER)) - 132
                   END AS dv
            FROM expo
        )
        SELECT vec_id AS asset_id, frame_idx,
               CAST(SUM(dv * dv) AS BIGINT) AS energy,
               CAST(SUM((s16 - dv) * (s16 - dv)) AS BIGINT) AS err_energy
        FROM dec GROUP BY 1, 2
    """,
    tags=("multimodal", "audio", "ulaw", "codec", "mapInPandas"),
)
def multimodal_wav_ulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy audio codec end to end: int16 samples µ-law-compress
    into genuine fmt-code-7 RIFF containers (any telephony stack opens
    them), the Arrow kernel parses and expands them, and both the
    decoded per-frame energy and the exact companding-error energy are
    value-hashed against a SQL replay of the integer companding
    formulas. The first audit where the CODEC LOSS itself — not just
    the decode — is cross-engine exact.

    Scale design: same shape as every multimodal leg — fabrication and
    decode are per-asset Arrow kernels (binary in, skinny typed rows
    out), the only join is asset_id-keyed against the 64-int original
    sample array, and nothing wide crosses a shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    assets = embeddings_as_ulaw_wav_assets(emb)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            F.least(F.greatest(x.cast("double"), F.lit(-1.0)), F.lit(1.0)) * 32767.0
            + F.lit(0.5)
        ).cast("int"),
    )
    originals = emb.select(F.col("vec_id").alias("asset_id"), q.alias("s16"))
    return wav_ulaw_roundtrip_energy(assets, originals)
