"""Pipeline batch 26: perceptual image dedup (aHash over the multimodal
decode path), classifier evaluation (decile lift over the trained
logreg), and a two-proportion z-test — closing the loop from raw
multimodal payloads and trained models back to decisions.

The aHash oracle works because the fallback decoder is a deterministic
function of md5(payload) (operators/multimodal.py): DuckDB rebuilds the
8x8 grid's bit pattern from the md5 hex directly — the Python
mapInPandas kernel and the SQL agree bit-for-bit, making a perceptual
hash hash-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.operators.multimodal import (
    ahash_assets,
    documents_as_assets,
)
from multithreaded_map_reduce_library_spark.plans.pipeline22 import (
    _LR_GRID,
    _logreg_chain_sql,
    _logreg_train,
    _z_expr,
)
from multithreaded_map_reduce_library_spark.functions.grid import grid, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


def _ahash_oracle() -> str:
    hv = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    byte = lambda i: f"(16 * {hv.format(p=2 * i + 1)} + {hv.format(p=2 * i + 2)})"  # noqa: E731
    total = " + ".join(byte(i) for i in range(16))
    bit = lambda i: f"(CASE WHEN 16 * {byte(i)} > tot THEN 1 ELSE 0 END)"  # noqa: E731
    chars = []
    for j in range(4):
        idx = (
            f"8 * {bit(4 * j)} + 4 * {bit(4 * j + 1)}"
            f" + 2 * {bit(4 * j + 2)} + {bit(4 * j + 3)}"
        )
        chars.append(f"substr('0123456789abcdef', 1 + {idx}, 1)")
    quad = " || ".join(chars)
    return f"""
        WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
        t AS (SELECT doc_id, h, {total} AS tot FROM m),
        a AS (SELECT doc_id, repeat({quad}, 4) AS ahash FROM t)
        SELECT ahash, COUNT(*) AS n_assets,
               MIN(doc_id) AS keep_asset
        FROM a GROUP BY ahash
    """


@register(
    "multimodal_ahash_dedup",
    oracle=_ahash_oracle(),
    tags=("multimodal", "dedup", "perceptual-hash", "mapInPandas"),
)
def multimodal_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: aHash (8x8 average hash) fingerprints via
    the Arrow-batched decode path, grouped into identical-fingerprint
    clusters with a keep-lowest-id decision — the image-tier analogue of
    exact text dedup, and the standard first pass before pHash/embedding
    tiers in a multimodal corpus pipeline.

    The deterministic fallback decoder makes the WHOLE Python kernel
    oracle-replayable: DuckDB reconstructs each 8x8 grid's above-mean
    bit pattern from md5 hex arithmetic and packs the identical 16-hex
    fingerprint (module docstring).

    Scale design: decode + hash is pure map-side mapInPandas (columnar
    batches, no driver); the dedup is ONE skinny shuffle of (ahash)
    16-char keys with map-side combine. 100 TB of images reduce to
    |distinct fingerprints| rows.
    """
    assets = documents_as_assets(load_table(spark, sf_dir, "documents"))
    hashed = ahash_assets(assets)
    return hashed.groupBy("ahash").agg(
        F.count("*").alias("n_assets"),
        F.min("asset_id").alias("keep_asset"),
    )


def _decile_oracle() -> str:
    chain, prev = _logreg_chain_sql()
    return f"""
        WITH {chain},
        scored AS (
            SELECT doc_id, y,
                   CAST(FLOOR((((w0 + w1*x1) + w2*x2) + w3*x3)
                              * {_LR_GRID} + 0.5) AS BIGINT) AS z_q
            FROM feat CROSS JOIN {prev}
        ),
        d AS (
            SELECT doc_id, y, z_q,
                   NTILE(10) OVER (ORDER BY z_q DESC, doc_id ASC) AS decile
            FROM scored
        ),
        tot AS (SELECT COUNT(*) AS n_tot,
                       SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS en_tot
                FROM scored)
        SELECT decile, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
               CAST(FLOOR(CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) * tot.n_tot
                          AS DOUBLE)
                     / CAST(COUNT(*) * tot.en_tot AS DOUBLE) * 1000000.0 + 0.5)
                    AS BIGINT) AS lift_e6
        FROM d CROSS JOIN tot
        GROUP BY decile, tot.n_tot, tot.en_tot
    """


@register(
    "logreg_decile_lift",
    oracle=_decile_oracle(),
    tags=("classifier", "evaluation", "lift", "ntile", "documents"),
)
def logreg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift evaluation of the trained logistic-regression
    classifier (pipeline22): score every document, cut into score
    deciles, and report each decile's capture lift over the base rate —
    the table a data-curation team reads before picking a keep
    threshold. The oracle replays training AND evaluation end to end.

    Determinism: scores ride the 1e6 grid (ties broken by doc_id in the
    NTILE order); lift is a single division of exactly-representable
    integer products.

    Scale design: scoring is one broadcast of the 1-row weight vector
    over a corpus scan; the NTILE runs on scored docs (at 100 TB: on
    the equi-depth histogram of z_q instead — shape unchanged); the
    rollup is 10 rows.
    """
    feat, n, w = _logreg_train(spark, sf_dir)
    scored = feat.crossJoin(F.broadcast(w)).select(
        "doc_id",
        "y",
        F.floor(_z_expr() * _LR_GRID + 0.5).cast("bigint").alias("z_q"),
    )
    d = scored.select(
        "doc_id",
        "y",
        F.ntile(10).over(Window.orderBy(F.desc("z_q"), F.asc("doc_id"))).alias(
            "decile"
        ),
    )
    tot = scored.agg(
        F.count("*").alias("n_tot"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("en_tot"),
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("decile", "n_tot", "en_tot")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("n_en"),
        )
        .select(
            "decile",
            "n_docs",
            "n_en",
            grid(
                (F.col("n_en") * F.col("n_tot")).cast("double")
                / (F.col("n_docs") * F.col("en_tot")).cast("double"),
                6,
            ).alias("lift_e6"),
        )
    )


@register(
    "conversion_rate_ztest",
    oracle="""
        WITH s AS (
            SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15'
                        THEN 1 ELSE 2 END AS grp,
                   event_type
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        agg AS (
            SELECT COUNT(*) FILTER (WHERE grp = 1) AS n1,
                   COUNT(*) FILTER (WHERE grp = 1 AND event_type = 'purchase') AS x1,
                   COUNT(*) FILTER (WHERE grp = 2) AS n2,
                   COUNT(*) FILTER (WHERE grp = 2 AND event_type = 'purchase') AS x2
            FROM s
        )
        SELECT n1, x1, n2, x2,
               CAST((x1 * 1000000 + n1 // 2) // n1 AS BIGINT) AS p1_e6,
               CAST((x2 * 1000000 + n2 // 2) // n2 AS BIGINT) AS p2_e6,
               CAST(FLOOR((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                     / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                            * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                            * (1.0 / n1 + 1.0 / n2)) * 1000000.0 + 0.5) AS BIGINT) AS z_e6
        FROM agg
    """,
    tags=("statistics", "ab-test", "events"),
)
def conversion_rate_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase share among click+purchase
    events, first two weeks vs the rest — the A/B-test primitive. One
    4-integer aggregate; the statistic is a fixed IEEE expression
    (identical association order both engines) over those integers,
    rounded for display.

    Scale design: a single map-side-combined aggregate over the
    filtered scan; nothing else. This is the cheapest query in the
    repo by design — the point is the statistic, not the plan.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.to_date("ts") < F.lit("2024-01-15").cast("date"), 1)
        .otherwise(2)
        .alias("grp"),
        "event_type",
    )
    agg = s.agg(
        F.count(F.when(F.col("grp") == 1, 1)).alias("n1"),
        F.count(
            F.when((F.col("grp") == 1) & (F.col("event_type") == "purchase"), 1)
        ).alias("x1"),
        F.count(F.when(F.col("grp") == 2, 1)).alias("n2"),
        F.count(
            F.when((F.col("grp") == 2) & (F.col("event_type") == "purchase"), 1)
        ).alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    return agg.select(
        "n1",
        "x1",
        "n2",
        "x2",
        int_ratio(F.col("x1"), F.col("n1"), 6).alias("p1_e6"),
        int_ratio(F.col("x2"), F.col("n2"), 6).alias("p2_e6"),
        grid(z, 6).alias("z_e6"),
    )


def _calibration_oracle() -> str:
    chain, prev = _logreg_chain_sql()
    return f"""
        WITH {chain},
        scored AS (
            SELECT doc_id, y,
                   CAST(FLOOR((1.0/(1.0 + exp(-((((w0 + w1*x1) + w2*x2) + w3*x3)))))
                              * {_LR_GRID} + 0.5) AS BIGINT) AS p_q
            FROM feat CROSS JOIN {prev}
        ),
        b AS (
            SELECT CASE WHEN p_q >= 1000000 THEN 9
                        ELSE CAST(p_q // 100000 AS BIGINT) END AS bin,
                   y, p_q
            FROM scored
        )
        SELECT bin, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
               CAST(SUM(p_q) AS DOUBLE) / COUNT(*) / {_LR_GRID} AS mean_pred,
               CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   AS frac_pos
        FROM b GROUP BY bin
    """


@register(
    "logreg_calibration_bins",
    oracle=_calibration_oracle(),
    tags=("classifier", "evaluation", "calibration", "documents"),
)
def logreg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the trained classifier: predicted
    probabilities (sigmoid of the trained score, grid-quantized) cut
    into 10 fixed-width bins, each reporting mean predicted probability
    vs empirical positive rate — where the two diverge, the classifier
    is mis-calibrated and its keep-threshold misleads. Completes the
    classifier-eval pair with ``logreg_decile_lift`` (ranking quality
    vs probability quality).

    Determinism: p rides the 1e6 grid BEFORE binning, so bin edges cut
    integers; the two display ratios are divisions of exact integers.

    Scale design: identical to decile lift minus the window — one
    broadcast-weights scan and a 10-row rollup, nothing else.
    """
    feat, n, w = _logreg_train(spark, sf_dir)
    p_q = F.floor(
        (1.0 / (1.0 + F.exp(-_z_expr()))) * _LR_GRID + 0.5
    ).cast("bigint")
    scored = feat.crossJoin(F.broadcast(w)).select("doc_id", "y", p_q.alias("p_q"))
    b = scored.select(
        F.when(F.col("p_q") >= 1000000, 9)
        .otherwise((F.col("p_q") / 100000).cast("bigint"))
        .cast("bigint")
        .alias("bin"),
        "y",
        "p_q",
    )
    return b.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("n_pos"),
        (F.sum("p_q").cast("double") / F.count("*") / _LR_GRID).alias("mean_pred"),
        (
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("frac_pos"),
    )
