"""Pipeline batch 87 (round 4): AUTOCORRELATION PITCH LAGS + HALF-LIFE
DECAYED RANKING — periodicity detection for the audio tier and
recency-weighted popularity for the analytics tier.

* ``multimodal_wav_autocorr`` — unnormalized autocorrelation
  Σ s[n]·s[n−L] at dyadic lags over REAL decoded WAV PCM: the integer
  core of autocorrelation pitch/periodicity detection (a waveform with
  period P spikes at lag P). Dominant-lag selection with a deterministic
  smallest-lag tie-break; the oracle replays the shifted dot products
  from the fabricated samples.
* ``decayed_topk_event_types`` — exponentially decayed popularity with a
  one-day half-life, done in EXACT integer arithmetic: the weight of a
  day aged ``a`` is the bit-shift 2^(20−a) (zero past 20 half-lives), so
  the decayed score Σ cnt_d·2^(20−age_d) needs no floating-point decay
  factor at all — the trick that makes recency-weighted rankings
  hash-stable across engines.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
neither tier; both queries extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    AUTOCORR_LAGS,
    embeddings_as_wav_assets,
    wav_autocorrelation,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DIM = 64


@register(
    "multimodal_wav_autocorr",
    oracle=f"""
        WITH s AS (
            SELECT vec_id, i - 1 AS n,
                   CAST(FLOOR(LEAST(GREATEST(CAST(list_extract(embedding, i) AS DOUBLE),
                                             -1.0), 1.0) * 32767.0 + 0.5) AS BIGINT) AS v
            FROM embeddings CROSS JOIN generate_series(1, {_DIM}) AS t(i)
        ),
        lags AS (SELECT unnest(ARRAY{list(AUTOCORR_LAGS)}) AS lag),
        acf AS (
            SELECT a.vec_id, l.lag,
                   CAST(SUM(a.v * b.v) AS BIGINT) AS acf_raw
            FROM s a
            CROSS JOIN lags l
            JOIN s b ON b.vec_id = a.vec_id AND b.n = a.n - l.lag
            GROUP BY a.vec_id, l.lag
        ),
        en AS (
            SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS energy FROM s GROUP BY vec_id
        ),
        ranked AS (
            SELECT vec_id, lag, acf_raw,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY acf_raw DESC, lag ASC) AS rk
            FROM acf
        )
        SELECT r.vec_id AS asset_id,
               CAST(r.lag AS INTEGER) AS lag,
               r.acf_raw,
               en.energy,
               r.rk = 1 AS is_dominant
        FROM ranked r JOIN en USING (vec_id)
    """,
    tags=("multimodal", "audio", "wav", "autocorrelation", "mapInPandas"),
)
def multimodal_wav_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodicity analysis over REAL WAV bytes: fabricate PCM16
    payloads, RIFF-parse them, and evaluate the exact integer
    autocorrelation Σ s[n]·s[n−L] at lags 1/2/4/8/16 plus the zero-lag
    energy; the lag with the highest ACF (smallest lag on ties) is
    flagged dominant — the estimator behind autocorrelation pitch
    detection and repetition screening for audio training data. The SQL
    oracle replays the shifted dot products from the same samples.

    Scale design: per-asset Arrow kernel over the binary scan — map-side
    only, |lags| skinny integer rows per asset, no shuffle."""
    assets = embeddings_as_wav_assets(load_table(spark, sf_dir, "embeddings"))
    return wav_autocorrelation(assets)


_HL_CAP = 20  # weights are 2^(cap - age); zero past the cap


@register(
    "decayed_topk_event_types",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        mx AS (SELECT MAX(day) AS last_day FROM daily),
        w AS (
            SELECT event_type, cnt,
                   date_diff('day', day, (SELECT last_day FROM mx)) AS age
            FROM daily
        ),
        scored AS (
            SELECT event_type,
                   CAST(SUM(cnt) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN age > {_HL_CAP} THEN 0
                                 ELSE cnt * (CAST(1 AS BIGINT) << ({_HL_CAP} - age))
                            END) AS BIGINT) AS score
            FROM w GROUP BY event_type
        )
        SELECT event_type, n_total, score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, event_type ASC) AS BIGINT) AS rank
        FROM scored
    """,
    tags=("analytics", "decay", "topk", "events", "recency"),
)
def decayed_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted event-type ranking with a one-day half-life:
    a day aged ``a`` (relative to the newest day in the data) weighs
    2^(20−a) — an EXACT integer bit-shift, zero beyond 20 half-lives —
    so the decayed score Σ cnt_d·w_d involves no floating-point decay
    constant and is hash-stable by construction. The recency ranking
    behind trending-now surfaces, here tie-broken deterministically by
    name.

    Scale design: one groupBy(type, day) over the fact scan (map-side
    combined); decay and ranking run on the tiny rollup; the newest-day
    lookup is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("cnt")
    )
    mx = daily.agg(F.max("day").alias("last_day"))
    w = (
        daily.crossJoin(F.broadcast(mx))  # 1-row grand aggregate (BNLJ-exempt)
        .select(
            "event_type",
            "cnt",
            F.datediff(F.col("last_day"), F.col("day")).alias("age"),
        )
    )
    scored = w.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_total"),
        F.sum(
            F.when(F.col("age") > _HL_CAP, F.lit(0)).otherwise(
                F.col("cnt")
                * F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HL_CAP} - age)")
            )
        )
        .cast("bigint")
        .alias("score"),
    )
    return scored.select(
        "event_type",
        "n_total",
        "score",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("event_type").asc()))
        .cast("bigint")
        .alias("rank"),
    )
