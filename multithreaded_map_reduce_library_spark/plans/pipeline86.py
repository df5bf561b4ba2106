"""Pipeline batch 86 (round 4): BENFORD FIRST-DIGIT AUDIT + HISTOGRAM
EQUALIZATION — a forensic data-quality screen and a real image
preprocessing op over decoded PNG bytes.

* ``benford_first_digit_audit`` — the classic fraud/anomaly screen:
  the first significant digit of every order total against Benford's law
  P(d) = log10(1 + 1/d). Natural multiplicative data follows it;
  fabricated or truncated feeds do not — per-digit observed vs expected
  shares with deviation, all on the integer grid (ln quotients of exact
  integers, the TF-IDF-family cross-engine argument).
* ``multimodal_hist_equalization`` — the standard contrast-normalization
  preprocessing step, run over REAL decoded PNG payloads: per-image
  16-level CDF, the classic transfer map(v) = round((cdf−cdf_min)·15 /
  (N−cdf_min)), and a position-weighted checksum of the equalized image.
  The oracle replays the whole chain (bucket → CDF → remap → checksum)
  in SQL from the fabricated pixel grid.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
neither tier; both queries extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_grid,
    duck_int_ratio,
    grid,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.operators.multimodal import (
    embeddings_as_png_assets,
    image_hist_equalization,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "benford_first_digit_audit",
    oracle=f"""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                        AS BIGINT) AS digit
            FROM orders
            WHERE o_totalprice >= 1.0
        ),
        cnt AS (
            SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cnt)
        SELECT digit,
               CAST(n AS BIGINT) AS n,
               {duck_int_ratio('CAST(n AS BIGINT)', '(SELECT nn FROM tot)', 6)} AS obs_e6,
               {duck_grid('ln(1.0 + 1.0 / digit) / ln(10.0)', 6)} AS exp_e6,
               ABS({duck_int_ratio('CAST(n AS BIGINT)', '(SELECT nn FROM tot)', 6)}
                   - {duck_grid('ln(1.0 + 1.0 / digit) / ln(10.0)', 6)}) AS dev_e6
        FROM cnt
    """,
    tags=("data-quality", "benford", "forensic", "orders"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed share of each
    leading digit vs the Benford expectation log10(1 + 1/d), with the
    absolute deviation per digit — the forensic screen that catches
    fabricated, truncated, or unit-mangled numeric feeds before they
    poison downstream statistics. Counts are exact; the expected share
    is a pure function of the digit (identical IEEE ln quotient both
    engines) on the e6 grid.

    Scale design: one scan → 9-row aggregate; the total is a 1-row
    broadcast. Nothing here grows with data size except the single
    map-side-combined count shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.where(F.col("o_totalprice") >= 1.0).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    cnt = d.groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    tot = cnt.agg(F.sum("n").cast("bigint").alias("nn"))
    obs = int_ratio(F.col("n"), F.col("nn"), 6)
    exp = grid(F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0)), 6)
    return (
        cnt.crossJoin(F.broadcast(tot))  # 1-row grand aggregate (BNLJ-exempt)
        .select(
            "digit",
            "n",
            obs.alias("obs_e6"),
            exp.alias("exp_e6"),
            F.abs(obs - exp).alias("dev_e6"),
        )
    )


_DIM = 64
_NB = 16  # histogram buckets

#: grayscale quantization — must match embeddings_as_png_assets exactly
_PX = (
    "CAST(FLOOR(LEAST(GREATEST((CAST(list_extract(embedding, i) AS DOUBLE) + 1.0)"
    " / 2.0, 0.0), 1.0) * 255.0) AS BIGINT)"
)


@register(
    "multimodal_hist_equalization",
    oracle=f"""
        WITH px AS (
            SELECT vec_id, i, {_PX} AS p
            FROM embeddings CROSS JOIN generate_series(1, {_DIM}) AS t(i)
        ),
        b AS (
            SELECT vec_id, i, p // {256 // _NB} AS bucket FROM px
        ),
        hist AS (
            SELECT vec_id, bucket, COUNT(*) AS cnt FROM b GROUP BY vec_id, bucket
        ),
        cdf AS (
            SELECT vec_id, bucket, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY vec_id ORDER BY bucket) AS BIGINT) AS c
            FROM hist
        ),
        cm AS (
            SELECT vec_id, MIN(c) AS cdf_min, COUNT(*) AS n_used
            FROM cdf WHERE cnt > 0 GROUP BY vec_id
        ),
        mapped AS (
            SELECT cdf.vec_id, cdf.bucket,
                   CASE WHEN {_DIM} = cm.cdf_min THEN 0
                        ELSE ((cdf.c - cm.cdf_min) * {_NB - 1}
                              + ({_DIM} - cm.cdf_min) // 2)
                             // ({_DIM} - cm.cdf_min)
                   END AS m
            FROM cdf JOIN cm USING (vec_id)
        )
        SELECT b.vec_id AS asset_id,
               CAST({_DIM} AS INTEGER) AS n_px,
               CAST(MAX(cm.n_used) AS INTEGER) AS n_buckets_used,
               CAST(SUM(mp.m) AS BIGINT) AS eq_sum,
               CAST(SUM(mp.m * b.i) AS BIGINT) AS eq_wsum
        FROM b
        JOIN mapped mp ON mp.vec_id = b.vec_id AND mp.bucket = b.bucket
        JOIN cm ON cm.vec_id = b.vec_id
        GROUP BY b.vec_id
    """,
    tags=("multimodal", "image", "png", "histeq", "mapInPandas", "preprocessing"),
)
def multimodal_hist_equalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram equalization over REAL PNG bytes: fabricate genuine PNG
    payloads from the embedding grid, decode with the stdlib codec,
    bucket to 16 gray levels, build the per-image CDF, and remap with
    the classic half-up transfer function — emitting the equalized
    image's exact sum and position-weighted checksum. The oracle replays
    bucket → CDF → remap → checksum entirely in SQL from the same
    quantized pixels, so one mis-mapped bucket or permuted pixel breaks
    the hash. Contrast normalization is a standard pre-ingestion
    transform for vision training data; this proves the engine runs it
    decoded-bytes-in, verified-integers-out.

    Scale design: encode and decode+equalize are per-asset Arrow kernels
    (mapInPandas) — map-side, zero shuffles, one skinny row per asset."""
    assets = embeddings_as_png_assets(load_table(spark, sf_dir, "embeddings"))
    return image_hist_equalization(assets)
