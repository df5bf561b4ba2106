"""Pipeline batch 63: audio ANALYSIS over the WAV assets — the
voice-activity front end (per-frame zero-crossing rate + peak alongside
energy) and silence-run segmentation (gaps-and-islands over frames).

Extends the pipeline62 audio tier from "decode works" to "the features a
speech-data pipeline actually filters on": energy+ZCR is the classic
two-feature VAD, and silence-run structure is how long-form audio gets
segmented into trainable utterances.

Oracle discipline (same as pipeline62): WAV payloads are fabricated from
embeddings with exact IEEE int16 quantization, so DuckDB replays every
sample — here via ONE generate_series unnest CTE instead of pipeline62's
unrolled per-sample expressions — and therefore every frame feature and
every run statistic. All outputs are exact integers; no grid needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    WAV_FRAME,
    embeddings_as_wav_assets,
    wav_frame_energy,
    wav_frame_features,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DIM = 64  # embedding length == samples per asset

#: Shared oracle CTE: every int16 sample replayed from the embedding
#: column (1-based index i), plus its frame index. list_extract(e, i)
#: is DuckDB's expression-index form of e[i].
_SAMPLES_CTE = f"""
    s AS (
        SELECT vec_id AS asset_id,
               i,
               CAST((i - 1) // {WAV_FRAME} AS INTEGER) AS frame_idx,
               CAST(FLOOR(LEAST(GREATEST(CAST(list_extract(embedding, i) AS DOUBLE),
                                         -1.0), 1.0) * 32767.0 + 0.5) AS BIGINT) AS v
        FROM embeddings CROSS JOIN generate_series(1, {_DIM}) AS t(i)
    )
"""


@register(
    "multimodal_wav_vad_features",
    oracle=f"""
        WITH {_SAMPLES_CTE},
        d AS (
            SELECT asset_id, frame_idx, v,
                   LAG(v) OVER (PARTITION BY asset_id, frame_idx ORDER BY i) AS pv
            FROM s
        )
        SELECT asset_id,
               frame_idx,
               CAST(SUM(v * v) AS BIGINT) AS energy,
               CAST(COALESCE(SUM(CASE WHEN pv IS NOT NULL
                                       AND (v < 0) <> (pv < 0) THEN 1 END), 0)
                    AS INTEGER) AS zcr,
               CAST(MAX(ABS(v)) AS INTEGER) AS peak
        FROM d
        GROUP BY asset_id, frame_idx
    """,
    tags=("multimodal", "audio", "wav", "vad", "mapInPandas"),
    bench=True,
)
def multimodal_wav_vad_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection front end over REAL decoded audio: per
    16-sample frame, exact integer energy Σs², zero-crossing count
    (within-frame adjacent sign changes, sign := s<0), and peak |s| —
    the three features the canonical energy/ZCR VAD thresholds on. The
    decode is the genuine RIFF chunk walk
    (operators/multimodal.py::wav_frame_features); the oracle replays
    every sample from the embedding column through one unnest CTE.

    Scale design: identical to the energy path — Arrow-batched map-side
    decode, 4 skinny integer rows per asset, zero shuffles. At 100 TB
    the only change is more frames per asset."""
    emb = load_table(spark, sf_dir, "embeddings")
    return wav_frame_features(embeddings_as_wav_assets(emb), frame=WAV_FRAME)


@register(
    "multimodal_wav_silence_runs",
    oracle=f"""
        WITH {_SAMPLES_CTE},
        fr AS (
            SELECT asset_id, frame_idx, CAST(SUM(v * v) AS BIGINT) AS energy
            FROM s GROUP BY asset_id, frame_idx
        ),
        flag AS (
            SELECT asset_id, frame_idx, energy,
                   CASE WHEN energy * {_DIM // WAV_FRAME}
                             < SUM(energy) OVER (PARTITION BY asset_id)
                        THEN 1 ELSE 0 END AS silent
            FROM fr
        ),
        isl AS (
            SELECT asset_id, silent,
                   frame_idx - ROW_NUMBER() OVER (
                       PARTITION BY asset_id, silent ORDER BY frame_idx) AS grp
            FROM flag
        ),
        runs AS (
            SELECT asset_id, COUNT(*) AS run_len
            FROM isl WHERE silent = 1 GROUP BY asset_id, silent, grp
        )
        SELECT f.asset_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(f.silent) AS BIGINT) AS n_silent,
               CAST(COALESCE(MAX(r.n_runs), 0) AS BIGINT) AS n_runs,
               CAST(COALESCE(MAX(r.max_run), 0) AS BIGINT) AS max_run
        FROM flag f
        LEFT JOIN (SELECT asset_id, COUNT(*) AS n_runs, MAX(run_len) AS max_run
                   FROM runs GROUP BY asset_id) r USING (asset_id)
        GROUP BY f.asset_id
    """,
    tags=("multimodal", "audio", "wav", "segmentation", "gaps-and-islands"),
)
def multimodal_wav_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-run segmentation over decoded frame energies: a frame is
    "silent" when its energy is strictly below the asset mean (energy *
    n_frames < total — an EXACT integer comparison, no division), and
    consecutive silent frames merge into runs via gaps-and-islands. Per
    asset: frame count, silent-frame count, number of silence runs, and
    the longest run — the segmentation statistics an utterance splitter
    thresholds on.

    Scale design: the decode is map-side; the run analysis is two window
    functions partitioned BY ASSET (frames of one asset are always
    co-partitioned — no global sort), then one aggregate per asset.
    State per asset is its frame list: bounded by clip length, not
    corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    fr = wav_frame_energy(embeddings_as_wav_assets(emb), frame=WAV_FRAME).select(
        "asset_id", "frame_idx", "energy"
    )
    w_asset = Window.partitionBy("asset_id")
    flag = fr.withColumn(
        "silent",
        F.when(
            F.col("energy") * F.lit(_DIM // WAV_FRAME)
            < F.sum("energy").over(w_asset),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    isl = flag.withColumn(
        "grp",
        F.col("frame_idx")
        - F.row_number().over(
            Window.partitionBy("asset_id", "silent").orderBy("frame_idx")
        ),
    )
    runs = (
        isl.filter(F.col("silent") == 1)
        .groupBy("asset_id", "grp")
        .agg(F.count("*").alias("run_len"))
        .groupBy("asset_id")
        .agg(
            F.count("*").alias("n_runs"),
            F.max("run_len").alias("max_run"),
        )
    )
    return (
        flag.groupBy("asset_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum("silent").alias("n_silent"),
        )
        .join(runs, "asset_id", "left")
        .select(
            "asset_id",
            "n_frames",
            "n_silent",
            F.coalesce(F.col("n_runs"), F.lit(0)).cast("bigint").alias("n_runs"),
            F.coalesce(F.col("max_run"), F.lit(0)).cast("bigint").alias("max_run"),
        )
    )
