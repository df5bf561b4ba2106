"""Pipeline batch 127 (round 5): REAL JPEG DECODE — the baseline-DCT
codec (functions/jpeg.py, VERDICT r4 item 7a) under the same
oracle-replay discipline as the PNG codec:

* ``multimodal_jpeg_roundtrip`` — embeddings quantized to 8-bit grey and
  painted as per-block-CONSTANT 8×8 blocks (64 dims → a 64×64 image),
  encoded to genuine baseline JPEG bytes by the from-scratch encoder in
  an Arrow pandas UDF, then DECODED back by the mapInPandas decode stage
  (now routed through functions/jpeg.decode_jpeg — the PIL gate is
  gone). Constant blocks make the lossy DC-only reconstruction
  closed-form: the oracle recomputes
  ``clip(floor((round_half_away(8·(v−128)/q00)·q00 + 4)/8) + 128, 0,
  255)`` per block in exact integer SQL, so any marker/Huffman/
  entropy/IDCT bug breaks the value hash.
* ``multimodal_jpeg_quality_sweep`` — the same assets encoded at two
  quantization scales (q00 = 16 and 32): per-asset decoded pixel sums
  per scale, both closed-form in the oracle. Pins the quality knob and
  the DQT parse path (two different tables through one decoder).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
image tier; these extend the driver-mandated multimodal superset.

Scale design: both queries are scan → pandas-UDF encode → mapInPandas
decode → tiny typed rows; no shuffle carries pixels, no driver
involvement — the 100 TB image-pipeline plan shape (per-batch Arrow
kernels, embarrassingly parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


def _duck_block_sum(q00: int) -> str:
    """DuckDB expression: Σ over embedding elements of 64 · recon(v),
    replaying the codec's exact DC-only arithmetic (see
    functions/jpeg.py determinism contract) at quant step ``q00``."""
    return f"""
        list_aggregate(
            list_transform(
                list_transform(CAST(embedding AS DOUBLE[]),
                    x -> CAST(FLOOR(LEAST(GREATEST((x + 1.0) / 2.0, 0.0), 1.0)
                                    * 255.0) AS BIGINT) - 128),
                m -> 64 * LEAST(GREATEST(
                        CAST(FLOOR(((CASE WHEN m >= 0
                                     THEN (16 * m + {q00}) // (2 * {q00})
                                     ELSE -((16 * (-m) + {q00}) // (2 * {q00}))
                                     END) * {q00} + 4) / 8.0) AS BIGINT) + 128,
                        0), 255)),
            'sum')::BIGINT
    """


@register(
    "multimodal_jpeg_roundtrip",
    oracle=f"""
        SELECT vec_id AS asset_id,
               CAST(64 AS INTEGER) AS width,
               CAST(64 AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS channels,
               {_duck_block_sum(16)} AS sum_px
        FROM embeddings
    """,
    tags=("multimodal", "image-decode", "jpeg", "mapInPandas"),
    bench=True,
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, end to end: per-block-constant grey
    images built from embeddings, encoded by the from-scratch encoder
    (pandas UDF), decoded by the mapInPandas stage through
    functions/jpeg.decode_jpeg, reduced to geometry + exact pixel sum.
    The oracle replays the DC-only reconstruction in integer SQL —
    replaces the round-1..4 PIL-gated JPEG path with a tested one."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return decode_image_meta(embeddings_as_jpeg_assets(emb))


@register(
    "multimodal_jpeg_restart_roundtrip",
    oracle=f"""
        SELECT vec_id AS asset_id,
               CAST(64 AS INTEGER) AS width,
               CAST(64 AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS channels,
               {_duck_block_sum(16)} AS sum_px
        FROM embeddings
    """,
    tags=("multimodal", "image-decode", "jpeg", "restart-markers", "mapInPandas"),
)
def multimodal_jpeg_restart_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The roundtrip re-encoded with DRI=4 — an RSTm marker every 4 MCUs
    (byte-aligned, DC predictors reset, RST0-7 sequence checked). Restart
    markers must be TRANSPARENT to the decoded pixels, so the oracle is
    byte-identical to ``multimodal_jpeg_roundtrip``'s closed form; any
    mis-handled alignment, predictor reset, or sequence number breaks the
    hash. Restart intervals are what make huge JPEGs seekable/parallel-
    decodable at 100 TB — a decoder can start at any RST boundary."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return decode_image_meta(embeddings_as_jpeg_assets(emb, restart_interval=4))


@register(
    "multimodal_jpeg_parallel_decode",
    oracle=f"""
        SELECT vec_id AS asset_id,
               CAST(16 AS INTEGER) AS n_segments,
               CAST(64 AS INTEGER) AS n_blocks,
               {_duck_block_sum(16)} AS sum_px
        FROM embeddings
    """,
    tags=("multimodal", "image-decode", "jpeg", "distributed-decode", "mapInPandas"),
    bench=True,
)
def multimodal_jpeg_parallel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED single-asset JPEG decode — the 100 TB shape for huge
    scan images: stage 1 splits each DRI=4 payload at its RSTm
    boundaries into 16 independently decodable entropy segments (restart
    markers byte-align and reset DC predictors, so segments carry zero
    upstream state); a repartition fans one asset's segments across the
    cluster; stage 2 decodes each segment and emits a 2-int partial; the
    per-asset groupBy reassembles totals moving ints, never pixels. The
    oracle is the same closed-form DC reconstruction as the whole-file
    roundtrip — so the split/fan-out/reassemble path must agree with the
    sequential decoder bit-for-bit."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_jpeg_segments,
        embeddings_as_jpeg_assets,
        split_jpeg_segments,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assets = embeddings_as_jpeg_assets(emb, restart_interval=4)
    segments = split_jpeg_segments(assets)
    par = spark.sparkContext.defaultParallelism
    sums = decode_jpeg_segments(segments.repartition(par, "asset_id", "seg_idx"))
    return sums.groupBy("asset_id").agg(
        F.count("*").cast("int").alias("n_segments"),
        F.sum("n_blocks").cast("int").alias("n_blocks"),
        F.sum("sum_px_part").cast("bigint").alias("sum_px"),
    )


def _duck_recon_list(q00: int) -> str:
    """DuckDB expression: the per-element DC-only reconstruction values
    as a list (the 8×8 block means the aHash downsample recovers)."""
    return f"""
        list_transform(
            list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(FLOOR(LEAST(GREATEST((x + 1.0) / 2.0, 0.0), 1.0)
                                * 255.0) AS BIGINT) - 128),
            m -> LEAST(GREATEST(
                    CAST(FLOOR(((CASE WHEN m >= 0
                                 THEN (16 * m + {q00}) // (2 * {q00})
                                 ELSE -((16 * (-m) + {q00}) // (2 * {q00}))
                                 END) * {q00} + 4) / 8.0) AS BIGINT) + 128,
                    0), 255))
    """


def _duck_ahash_pack() -> str:
    """Pack the 64 above-mean bits (strict >, matching the kernel's
    ``flat > flat.mean()`` via the integer test 64·rᵢ > Σr) into 16 hex
    chars MSB-first — identical to the kernel's ``f"{val:016x}"``."""
    bit = lambda i: f"(CASE WHEN 64 * r[{i}] > tot THEN 1 ELSE 0 END)"  # noqa: E731
    chars = []
    for j in range(16):
        idx = (
            f"8 * {bit(4 * j + 1)} + 4 * {bit(4 * j + 2)}"
            f" + 2 * {bit(4 * j + 3)} + {bit(4 * j + 4)}"
        )
        chars.append(f"substr('0123456789abcdef', 1 + {idx}, 1)")
    return " || ".join(chars)


@register(
    "multimodal_jpeg_ahash_dedup",
    oracle=f"""
        WITH recons AS (
            SELECT vec_id, {_duck_recon_list(16)} AS r FROM embeddings
        ),
        t AS (SELECT vec_id, r, list_aggregate(r, 'sum') AS tot FROM recons),
        a AS (SELECT vec_id, {_duck_ahash_pack()} AS ahash FROM t)
        SELECT ahash, COUNT(*) AS n_assets, MIN(vec_id) AS keep_asset
        FROM a GROUP BY ahash
    """,
    tags=("multimodal", "dedup", "perceptual-hash", "jpeg", "mapInPandas"),
)
def multimodal_jpeg_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image-curation composite: decode REAL baseline JPEGs through
    the from-scratch codec, aHash the decoded pixels (8×8 block-mean
    downsample → strict-above-mean bits → 16 hex chars), and group
    identical fingerprints with a keep-lowest-id decision. Because the
    fixtures are per-block-constant, the aHash downsample recovers
    exactly the DC reconstruction values, so the ENTIRE decode→
    perceptual-hash→dedup chain is replayed in integer SQL — a codec,
    downsample, thresholding, or bit-packing bug all break the hash.

    Scale design: decode+hash is map-side mapInPandas; the dedup is one
    skinny shuffle of 16-char keys with map-side combine. 100 TB of
    images reduce to |distinct fingerprints| rows."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        ahash_assets,
        embeddings_as_jpeg_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    hashed = ahash_assets(embeddings_as_jpeg_assets(emb))
    return hashed.groupBy("ahash").agg(
        F.count("*").alias("n_assets"),
        F.min("asset_id").alias("keep_asset"),
    )


def _duck_recon(col: str, q00: int) -> str:
    """recon(v, q00): the DC-only reconstruction of a constant block."""
    return f"""
        LEAST(GREATEST(
            CAST(FLOOR(((CASE WHEN {col} - 128 >= 0
                         THEN (16 * ({col} - 128) + {q00}) // (2 * {q00})
                         ELSE -((16 * (128 - {col}) + {q00}) // (2 * {q00}))
                         END) * {q00} + 4) / 8.0) AS BIGINT) + 128,
            0), 255)
    """


@register(
    "multimodal_jpeg420_roundtrip",
    oracle=f"""
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
        -- e0 literals force DOUBLE: DuckDB parses 0.299 as DECIMAL and
        -- would compute the transform in exact decimal arithmetic,
        -- diverging from the encoder's IEEE-double numpy (e.g. rgb
        -- (120,132,124): decimal Y = 128.000 exactly, double Y =
        -- 127.99999999999999 -> floor 127)
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
    """,
    tags=("multimodal", "image-decode", "jpeg", "chroma-subsampling", "mapInPandas"),
)
def multimodal_jpeg420_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR 4:2:0 JPEG roundtrip — the web's default storage format:
    16 RGB triples from each embedding painted as constant 16×16
    macroblocks, encoded at YCbCr 4:2:0 (chroma 2×2 box-mean
    downsampled, two quantization tables), decoded back through the
    interleaved-MCU path with replication upsampling and the BT.601
    inverse. Constant macroblocks keep every block DC-only through the
    subsample, so the oracle replays the ENTIRE color chain — forward
    transform, both quant tables, reconstruction, upsample, inverse
    transform — in arithmetic both engines compute identically; any
    MCU-interleave, plane-geometry, upsample, or color-math bug breaks
    the hash."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg420_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return decode_image_meta(embeddings_as_jpeg420_assets(emb))


@register(
    "multimodal_jpeg_subsampling_parity",
    oracle=f"""
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
        ),
        sums AS (
            SELECT vec_id AS asset_id,
                   CAST(SUM(256 * (r2 + g2 + b2)) AS BIGINT) AS sum_px
            FROM rgb GROUP BY vec_id
        )
        SELECT asset_id, m.mode AS mode, sum_px
        FROM sums CROSS JOIN (VALUES ('420'), ('422'), ('444')) AS m(mode)
    """,
    tags=("multimodal", "image-decode", "jpeg", "chroma-subsampling", "parity"),
)
def multimodal_jpeg_subsampling_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-mode MCU-layout parity: the same constant-macroblock assets
    encoded at 4:4:4 (one block per component per MCU), 4:2:2 (2+1+1
    blocks, horizontal chroma halving), and 4:2:0 (4+1+1 blocks, 2×2
    halving) must decode to IDENTICAL pixels — constant macroblocks make
    every subsample lossless and every block DC-only, so the three
    interleave layouts are mathematically equivalent. The oracle emits
    the one closed-form sum per asset for all three mode rows; any
    layout-specific decode bug (block raster order within an MCU, plane
    geometry, upsample factors) breaks exactly the affected mode's rows."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg420_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = []
    for mode in ("420", "422", "444"):
        decoded = decode_image_meta(
            embeddings_as_jpeg420_assets(emb, subsampling=mode)
        )
        out.append(
            decoded.select("asset_id", F.lit(mode).alias("mode"), "sum_px")
        )
    return out[0].unionAll(out[1]).unionAll(out[2])


@register(
    "stream_multimodal_jpeg_ingest",
    oracle=f"""
        SELECT vec_id AS asset_id,
               CAST(64 AS INTEGER) AS width,
               CAST(64 AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS channels,
               {_duck_block_sum(16)} AS sum_px
        FROM embeddings
    """,
    tags=("streaming", "multimodal", "image-decode", "jpeg", "mapInPandas", "ingest"),
)
def stream_multimodal_jpeg_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING image decode at ingest — the JPEG twin of
    ``stream_multimodal_wav_ingest``: assets arrive as a file stream,
    are encoded to baseline JPEG by the pandas-UDF fabricator
    (spread=False — parallelism comes from the file source, the ingest
    tier stays shuffle-free), decoded by the mapInPandas DCT kernel, all
    inside one streaming plan drained with AvailableNow. Stateless
    per-asset work → output invariant to micro-batch boundaries, so the
    batch closed-form oracle applies unchanged.

    Scale design: continuous image ingest — each micro-batch decodes its
    files map-side (Arrow batches, zero shuffles, zero state, no
    driver); skinny geometry+sum rows append downstream."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg_assets,
    )
    from multithreaded_map_reduce_library_spark.streaming.windows import (
        embeddings_stream,
        run_stream_to_df,
    )

    emb = embeddings_stream(spark, sf_dir)
    decoded = decode_image_meta(embeddings_as_jpeg_assets(emb, spread=False))
    return run_stream_to_df(spark, decoded, "append")


@register(
    "multimodal_jpeg_quality_sweep",
    oracle=f"""
        SELECT vec_id AS asset_id, CAST(16 AS INTEGER) AS q00,
               {_duck_block_sum(16)} AS sum_px
        FROM embeddings
        UNION ALL
        SELECT vec_id AS asset_id, CAST(32 AS INTEGER) AS q00,
               {_duck_block_sum(32)} AS sum_px
        FROM embeddings
    """,
    tags=("multimodal", "image-decode", "jpeg", "quality-sweep", "mapInPandas"),
)
def multimodal_jpeg_quality_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-knob sweep: the same assets encoded at quant scale 1
    (q00=16, the Annex K.1 table) and 2 (q00=32), decoded back, pixel
    sums compared per scale. Exercises the DQT parse with two distinct
    tables and pins that coarser quantization degrades pixels exactly as
    the closed-form predicts — the audit a pipeline runs before choosing
    a storage quality for 100 TB of images."""
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        decode_image_meta,
        embeddings_as_jpeg_assets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = []
    for qscale, q00 in ((1, 16), (2, 32)):
        decoded = decode_image_meta(embeddings_as_jpeg_assets(emb, qscale=qscale))
        out.append(
            decoded.select(
                "asset_id", F.lit(q00).cast("int").alias("q00"), "sum_px"
            )
        )
    return out[0].unionAll(out[1])
