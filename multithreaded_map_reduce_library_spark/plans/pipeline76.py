"""Pipeline batch 76 (round 4): STREAMING MEDIA INGEST — decode audio
inside a Structured Streaming plan.

Every prior media query decodes at rest; a production training-data
pipeline decodes assets AS THEY LAND. This tier runs the full fabricate →
RIFF-parse → frame-energy kernel chain (pandas UDF + mapInPandas — both
fully supported on streaming DataFrames) inside a ``readStream`` plan
drained with AvailableNow. The transform is STATELESS (per-asset kernels,
no watermark, no stateful operator), so the result is independent of
micro-batch boundaries — ``tests/test_round4_operators.py::
test_stream_wav_ingest_invariant_to_micro_batching`` re-runs the plan
against a 4-file split source at maxFilesPerTrigger=1 and requires
identical rows — and the batch oracle replays every sample from the
embedding column as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    WAV_FRAME,
    embeddings_as_wav_assets,
    wav_frame_energy,
)
from multithreaded_map_reduce_library_spark.plans.registry import register

_DIM = 64


@register(
    "stream_multimodal_wav_ingest",
    oracle=f"""
        WITH s AS (
            SELECT vec_id AS asset_id,
                   CAST((i - 1) // {WAV_FRAME} AS INTEGER) AS frame_idx,
                   CAST(FLOOR(LEAST(GREATEST(CAST(list_extract(embedding, i) AS DOUBLE),
                                             -1.0), 1.0) * 32767.0 + 0.5) AS BIGINT) AS v
            FROM embeddings CROSS JOIN generate_series(1, {_DIM}) AS t(i)
        )
        SELECT asset_id,
               CAST(16000 AS INTEGER) AS sample_rate,
               CAST({_DIM} AS INTEGER) AS n_samples,
               frame_idx,
               CAST(SUM(v * v) AS BIGINT) AS energy
        FROM s
        GROUP BY asset_id, frame_idx
    """,
    tags=("streaming", "multimodal", "audio", "wav", "mapInPandas", "ingest"),
)
def stream_multimodal_wav_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING audio decode at ingest: assets arrive as a file stream,
    are wrapped into genuine PCM16 WAV containers by the pandas-UDF
    encoder, RIFF-parsed and frame-energied by the mapInPandas kernel —
    all inside one streaming plan, drained with AvailableNow. Stateless
    per-asset work means the output is invariant to how the source is
    micro-batched (1 file or N — a dedicated test replays the plan over
    a 4-chunk split source at one file per trigger), so the batch
    oracle applies unchanged.

    Scale design: on a real cluster this is the continuous ingest tier —
    file notifications feed executors, each micro-batch decodes its
    files map-side (Arrow batches, zero shuffles, no driver), and the
    skinny frame rows append straight to the feature store. Backpressure
    is per-trigger file caps; state is zero."""
    from multithreaded_map_reduce_library_spark.streaming.windows import (
        embeddings_stream,
        run_stream_to_df,
    )

    emb = embeddings_stream(spark, sf_dir)
    decoded = wav_frame_energy(embeddings_as_wav_assets(emb), frame=WAV_FRAME)
    return run_stream_to_df(spark, decoded, "append")
