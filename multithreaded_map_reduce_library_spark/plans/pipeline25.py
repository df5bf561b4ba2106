"""Pipeline batch 25: streaming windowed top-k (rank-after-drain) and
KMV sketch SET ALGEBRA (intersection estimation) — extending the
streaming matrix and the deterministic-sketch tier.

The KMV intersection estimator (Beyer et al. 2007, "On synopses for
distinct-value estimation under multiset operations") is, like
pipeline21's KMV, ENTIRELY deterministic integer/IEEE arithmetic —
so the oracle replays the sketch itself, not just an error bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.pipeline21 import (
    _hash48,
    _hash48_sql,
)
from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "stream_daily_topk_event_types",
    oracle="""
        WITH c AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        r AS (
            SELECT day, event_type, n,
                   CAST(ROW_NUMBER() OVER (PARTITION BY day
                                           ORDER BY n DESC, event_type ASC) AS BIGINT)
                       AS rnk
            FROM c
        )
        SELECT day, event_type, n, rnk FROM r WHERE rnk <= 3
    """,
    tags=("streaming", "topk", "window", "events"),
)
def stream_daily_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k: daily tumbling-window counts per event type
    accumulate in Structured Streaming (2h watermark, AvailableNow
    drain), and the top-3 rank per day is taken AFTER the drain — the
    production pattern for streaming leaderboards (rank inside the
    stream would re-rank on every trigger; rank-after-sink is exact,
    deterministic, and what Spark's own docs recommend for complete-
    mode toppers).

    Scale design: streaming state is one row per (day, type) — bounded
    by the watermark horizon x type cardinality, not by throughput; the
    post-drain rank runs on that skinny relation. The batch twin is the
    oracle (streaming/batch unification).
    """
    from multithreaded_map_reduce_library_spark.streaming.windows import (
        events_stream,
        run_stream_to_df,
    )

    ev = events_stream(spark, sf_dir)
    counts = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("day"), "event_type", "n")
    )
    drained = run_stream_to_df(spark, counts)
    w = Window.partitionBy("day").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        drained.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("day", "event_type", "n", "rnk")
    )


_KI_K = 64
_POW48 = 1 << 48


@register(
    "kmv_intersection_click_purchase",
    oracle=f"""
        WITH u AS (
            SELECT {_hash48_sql("user_id")} AS h,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY 1
        ),
        ranked AS (
            SELECT h, in_a, in_b,
                   ROW_NUMBER() OVER (ORDER BY h ASC) AS rk_u,
                   CASE WHEN in_a = 1 THEN
                       ROW_NUMBER() OVER (PARTITION BY in_a ORDER BY h ASC) END AS rk_a,
                   CASE WHEN in_b = 1 THEN
                       ROW_NUMBER() OVER (PARTITION BY in_b ORDER BY h ASC) END AS rk_b,
                   COUNT(*) OVER () AS n_union
            FROM u
        ),
        kth AS (SELECT h AS h_k FROM ranked WHERE rk_u = {_KI_K}),
        rho AS (
            SELECT COUNT(*) FILTER (WHERE rk_u <= {_KI_K}
                                    AND rk_a <= {_KI_K} AND rk_b <= {_KI_K}
                                    AND in_a = 1 AND in_b = 1) AS k_both,
                   MAX(n_union) AS n_union,
                   COUNT(*) FILTER (WHERE in_a = 1 AND in_b = 1) AS exact_both
            FROM ranked
        )
        SELECT rho.exact_both,
               rho.k_both,
               CAST(FLOOR((CASE WHEN kth.h_k IS NULL
                          THEN CAST(rho.exact_both AS DOUBLE)
                          ELSE (CAST(rho.k_both AS DOUBLE) / {_KI_K})
                               * (CAST({_KI_K - 1} AS DOUBLE) * {_POW48} / kth.h_k)
                     END) * 1000000.0 + 0.5) AS BIGINT) AS est_e6
        FROM rho LEFT JOIN kth ON TRUE
    """,
    tags=("sketch", "kmv", "set-algebra", "events"),
)
def kmv_intersection_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra: estimate |clickers ∩ purchasers| from two
    K=64 KMV sketches alone (Beyer et al. 2007) — the union sketch's K
    smallest hashes are inspected for joint membership (rho = K_both/K)
    and scaled by the union's distinct estimate. Exactly what a
    1000-executor audience-overlap job does WITHOUT ever joining the
    raw user sets; the exact intersection rides along as the error
    audit.

    Determinism: the sketch is an order statistic of 48-bit md5 hashes
    — pure integers — and the estimate is two IEEE ops on
    exactly-representable values; the oracle replays all of it.

    Scale design: one user-keyed aggregate (map-side combine) computes
    the membership flags; everything downstream runs on the DISTINCT
    user-hash relation, and in production only the 2xK-hash sketches
    would ship to the coordinator (mergeability: test_kmv_merge_law).
    """
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(_hash48(F.col("user_id")).alias("h"))
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    wu = Window.orderBy(F.asc("h"))
    ranked = u.select(
        "h",
        "in_a",
        "in_b",
        F.row_number().over(wu).alias("rk_u"),
        F.when(
            F.col("in_a") == 1,
            F.row_number().over(Window.partitionBy("in_a").orderBy(F.asc("h"))),
        ).alias("rk_a"),
        F.when(
            F.col("in_b") == 1,
            F.row_number().over(Window.partitionBy("in_b").orderBy(F.asc("h"))),
        ).alias("rk_b"),
        F.count("*").over(Window.partitionBy()).alias("n_union"),
    )
    # grand aggregate (one row, NULL when the union has < K hashes) so the
    # broadcast build side is structurally a one-row aggregate for the audit
    kth = ranked.where(F.col("rk_u") == _KI_K).agg(F.max("h").alias("h_k"))
    rho = ranked.agg(
        F.count(
            F.when(
                (F.col("rk_u") <= _KI_K)
                & (F.col("rk_a") <= _KI_K)
                & (F.col("rk_b") <= _KI_K)
                & (F.col("in_a") == 1)
                & (F.col("in_b") == 1),
                1,
            )
        ).alias("k_both"),
        F.max("n_union").alias("n_union"),
        F.count(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1)).alias(
            "exact_both"
        ),
    )
    est = (
        rho.crossJoin(F.broadcast(kth))
        .select(
            "exact_both",
            "k_both",
            grid(
                F.when(F.col("h_k").isNull(), F.col("exact_both").cast("double"))
                .otherwise(
                    (F.col("k_both").cast("double") / _KI_K)
                    * (F.lit(float(_KI_K - 1)) * _POW48 / F.col("h_k"))
                ),
                6,
            ).alias("est_e6"),
        )
    )
    return est
