"""Pipeline batch 107 (round 4): HDR-HISTOGRAM QUANTILE SKETCH — the
quantile member of the audited-sketch tier (HLL distincts, KMV
intersections, CMS counts, Bloom membership — and now quantiles), built
the HdrHistogram way (Gil Tene's public design: power-of-two octaves ×
fixed sub-bucket resolution) so the sketch is INTEGER-EXACT and
DETERMINISTIC — no libm in the bucketing path, hence bit-identical
across engines, unlike log-γ DDSketch buckets whose ln() can differ in
the last ulp between JVMs and C libms:

* ``hdr_quantile_sketch`` — purchase values in cents bucket to
  bid = v for v < 32, else 64·msb + (v >> (msb−5)) with
  msb = len(bin(v))−1: per-octave width 2^(msb−5), relative error
  ≤ 1/32. The bucket-count vector IS the sketch (mergeable by
  addition — partial aggregation across executors is exactly the
  sketch merge). Quantiles q ∈ {50,90,95,99} read off the cumulative
  bucket walk; every row carries the EXACT quantile (full-data
  cumulative walk) and the proof obligation exact ∈ [lo, lo+width).
* ``hdr_quantiles_by_type`` — the same sketch as a per-group
  aggregate (event_type × bucket), demonstrating the
  groups × buckets skinny-state shape with the same per-row exactness
  audit.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
sketch tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_QS = (50, 90, 95, 99)

# bid in SQL (v is BIGINT cents, >= 0): exact small values, then
# 64*msb + top-6-bits. No floats anywhere.
_DUCK_BID = (
    "CASE WHEN v < 32 THEN v"
    " ELSE 64 * (length(bin(v)) - 1) + (v >> CAST(length(bin(v)) - 6 AS INTEGER)) END"
)
# lower bound / width reconstructed from bid alone
_DUCK_LO = (
    "CASE WHEN bid < 32 THEN bid"
    " ELSE (bid % 64) << CAST(bid // 64 - 5 AS INTEGER) END"
)
_DUCK_W = "CASE WHEN bid < 32 THEN 1 ELSE 1 << CAST(bid // 64 - 5 AS INTEGER) END"


def _spark_bid() -> F.Column:
    return F.expr(
        "CASE WHEN v < 32 THEN v"
        " ELSE 64 * CAST(length(bin(v)) - 1 AS BIGINT)"
        "      + shiftright(v, CAST(length(bin(v)) - 6 AS INT)) END"
    ).cast("bigint")


def _spark_lo_w() -> tuple[F.Column, F.Column]:
    lo = F.expr(
        "CASE WHEN bid < 32 THEN bid"
        " ELSE shiftleft(CAST(bid % 64 AS BIGINT), CAST(bid DIV 64 - 5 AS INT)) END"
    ).cast("bigint")
    w = F.expr(
        "CASE WHEN bid < 32 THEN CAST(1 AS BIGINT)"
        " ELSE shiftleft(CAST(1 AS BIGINT), CAST(bid DIV 64 - 5 AS INT)) END"
    ).cast("bigint")
    return lo, w


_VALS_SQL = """
    SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
    FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
"""


@register(
    "hdr_quantile_sketch",
    oracle=f"""
        WITH vals AS ({_VALS_SQL}),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
        sk AS (
            SELECT CAST({_DUCK_BID} AS BIGINT) AS bid, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM vals GROUP BY 1
        ),
        cum AS (
            SELECT bid, CAST({_DUCK_LO} AS BIGINT) AS lo, CAST({_DUCK_W} AS BIGINT) AS w,
                   CAST(SUM(cnt) OVER (ORDER BY bid) AS BIGINT) AS c
            FROM sk
        ),
        nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets FROM sk),
        nd AS (SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct FROM vals),
        targets AS (
            SELECT q, CAST((q * n + 99) // 100 AS BIGINT) AS t
            FROM (VALUES (50), (90), (95), (99)) AS tq(q) CROSS JOIN tot
        ),
        est AS (
            SELECT q, t, MIN(bid) AS bid
            FROM targets JOIN cum ON c >= t GROUP BY q, t
        ),
        ex AS (
            SELECT q, t, MIN(v) AS exact_v
            FROM targets JOIN (
                SELECT v, SUM(COUNT(*)) OVER (ORDER BY v) AS cv
                FROM vals GROUP BY v
            ) ON cv >= t GROUP BY q, t
        )
        SELECT e.q, e.t AS target_rank, c2.lo AS est_lo, c2.w AS bucket_width,
               x.exact_v,
               (x.exact_v >= c2.lo AND x.exact_v < c2.lo + c2.w) AS within,
               nb.n_buckets, nd.n_distinct
        FROM est e
        JOIN cum c2 ON c2.bid = e.bid
        JOIN ex x ON x.q = e.q
        CROSS JOIN nb CROSS JOIN nd
        ORDER BY e.q
    """,
    tags=("sketch", "quantile", "hdr-histogram", "events"),
)
def hdr_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram quantile sketch over purchase cents with per-row
    exactness audit: integer-only bucketing (64·msb + top-6-bits,
    relative error ≤ 1/32), the bucket-count vector as the mergeable
    sketch state (groupBy partial aggregation IS the sketch merge), the
    q∈{50,90,95,99} estimates from the cumulative bucket walk, and the
    proof obligation exact_quantile ∈ [lo, lo+width) carried per row
    (`within` must be uniformly true — the invariant test asserts it).

    Scale design: the sketch is |occupied buckets| ≤ 64·octaves rows
    regardless of corpus size, built in one map-side-combined groupBy;
    the exact-quantile audit leg is the only full-distinct relation and
    exists for verification — production reads quantiles from the
    bucket walk alone. Merging shards = summing count vectors, so the
    same plan holds on 1000 executors."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint").alias("v"))
    n = vals.agg(F.count("*").cast("bigint").alias("n"))
    sk = vals.select(_spark_bid().alias("bid")).groupBy("bid").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    lo, w = _spark_lo_w()
    wcum = Window.orderBy("bid").rowsBetween(Window.unboundedPreceding, 0)
    cum = sk.select(
        "bid",
        lo.alias("lo"),
        w.alias("w"),
        F.sum("cnt").over(wcum).cast("bigint").alias("c"),
    )
    nb = sk.agg(F.count("*").cast("bigint").alias("n_buckets"))
    nd = vals.agg(F.countDistinct("v").cast("bigint").alias("n_distinct"))
    targets = (
        spark.createDataFrame([(q,) for q in _QS], "q int")
        .crossJoin(F.broadcast(n))
        .select(
            "q",
            F.expr("CAST((q * n + 99) DIV 100 AS BIGINT)").alias("t"),
        )
    )
    est = (
        F.broadcast(targets)
        .join(cum, F.col("c") >= F.col("t"))
        .groupBy("q", "t")
        .agg(F.min("bid").alias("bid"))
    )
    exact_cum = (
        vals.groupBy("v")
        .agg(F.count("*").alias("cv0"))
        .select("v", F.sum("cv0").over(Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0)).alias("cv"))
    )
    ex = (
        F.broadcast(targets)
        .join(exact_cum, F.col("cv") >= F.col("t"))
        .groupBy("q")
        .agg(F.min("v").alias("exact_v"))
    )
    return (
        est.join(cum.select("bid", "lo", "w"), "bid")
        .join(ex, "q")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nd))
        .select(
            "q",
            F.col("t").alias("target_rank"),
            F.col("lo").alias("est_lo"),
            F.col("w").alias("bucket_width"),
            "exact_v",
            (
                (F.col("exact_v") >= F.col("lo"))
                & (F.col("exact_v") < F.col("lo") + F.col("w"))
            ).alias("within"),
            "n_buckets",
            "n_distinct",
        )
        .orderBy("q")
    )


@register(
    "hdr_quantiles_by_type",
    oracle=f"""
        WITH vals AS (
            SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
            FROM events WHERE value IS NOT NULL
        ),
        tot AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY event_type
        ),
        sk AS (
            SELECT event_type, CAST({_DUCK_BID} AS BIGINT) AS bid,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM vals GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, bid,
                   CAST({_DUCK_LO} AS BIGINT) AS lo, CAST({_DUCK_W} AS BIGINT) AS w,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bid)
                        AS BIGINT) AS c
            FROM sk
        ),
        targets AS (
            SELECT tot.event_type, q, CAST((q * n + 99) // 100 AS BIGINT) AS t
            FROM (VALUES (50), (95)) AS tq(q) CROSS JOIN tot
        ),
        est AS (
            SELECT tg.event_type, tg.q, tg.t, MIN(c2.bid) AS bid
            FROM targets tg
            JOIN cum c2 ON c2.event_type = tg.event_type AND c2.c >= tg.t
            GROUP BY tg.event_type, tg.q, tg.t
        ),
        ex AS (
            SELECT tg.event_type, tg.q, MIN(dv.v) AS exact_v
            FROM targets tg JOIN (
                SELECT event_type, v,
                       SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY v) AS cv
                FROM vals GROUP BY event_type, v
            ) dv ON dv.event_type = tg.event_type AND dv.cv >= tg.t
            GROUP BY tg.event_type, tg.q
        )
        SELECT e.event_type, e.q, e.t AS target_rank,
               c2.lo AS est_lo, c2.w AS bucket_width, x.exact_v,
               (x.exact_v >= c2.lo AND x.exact_v < c2.lo + c2.w) AS within
        FROM est e
        JOIN cum c2 ON c2.event_type = e.event_type AND c2.bid = e.bid
        JOIN ex x ON x.event_type = e.event_type AND x.q = e.q
        ORDER BY e.event_type, e.q
    """,
    tags=("sketch", "quantile", "hdr-histogram", "events", "grouped"),
)
def hdr_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HDR quantile sketch as a per-group aggregate: p50/p95 of
    value cents per event_type from a groups × buckets count state,
    with the same exact ∈ [lo, lo+width) audit per output row. The
    state is skinny (|types| × ≤ a few hundred buckets) and merges by
    addition within each group — the shape a 100 TB per-tenant latency
    dashboard uses.

    Scale design: one map-side-combined groupBy to the sketch state;
    windows run per-group on that bounded state, never on raw rows."""
    vals = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint").alias("v"),
        )
    )
    tot = vals.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))
    sk = vals.select("event_type", _spark_bid().alias("bid")).groupBy(
        "event_type", "bid"
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    lo, w = _spark_lo_w()
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sk.select(
        "event_type",
        "bid",
        lo.alias("lo"),
        w.alias("w"),
        F.sum("cnt").over(wcum).cast("bigint").alias("c"),
    )
    targets = (
        spark.createDataFrame([(q,) for q in (50, 95)], "q int")
        .crossJoin(tot)
        .select(
            "event_type", "q", F.expr("CAST((q * n + 99) DIV 100 AS BIGINT)").alias("t")
        )
    )
    est = (
        targets.join(
            cum.withColumnRenamed("event_type", "et2"),
            (F.col("et2") == F.col("event_type")) & (F.col("c") >= F.col("t")),
        )
        .groupBy("event_type", "q", "t")
        .agg(F.min("bid").alias("bid"))
    )
    exact_cum = (
        vals.groupBy("event_type", "v")
        .agg(F.count("*").alias("cv0"))
        .select(
            F.col("event_type").alias("et3"),
            "v",
            F.sum("cv0")
            .over(
                Window.partitionBy("event_type")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("cv"),
        )
    )
    ex = (
        targets.join(
            exact_cum,
            (F.col("et3") == F.col("event_type")) & (F.col("cv") >= F.col("t")),
        )
        .groupBy("event_type", "q")
        .agg(F.min("v").alias("exact_v"))
    )
    return (
        est.join(
            cum.select(F.col("event_type").alias("et4"), "bid", "lo", "w"),
            (F.col("et4") == F.col("event_type")) & (cum["bid"] == est["bid"]),
        )
        .drop(cum["bid"])
        .join(ex, ["event_type", "q"])
        .select(
            "event_type",
            "q",
            F.col("t").alias("target_rank"),
            F.col("lo").alias("est_lo"),
            F.col("w").alias("bucket_width"),
            "exact_v",
            (
                (F.col("exact_v") >= F.col("lo"))
                & (F.col("exact_v") < F.col("lo") + F.col("w"))
            ).alias("within"),
        )
        .orderBy("event_type", "q")
    )
