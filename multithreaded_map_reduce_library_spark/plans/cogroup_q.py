"""Cogrouped custom Python operator: ``groupBy().cogroup().applyInPandas``
— the two-input completion of the UDF surface (mapper = per-split UDTF,
reducer = grouped UDAF, grouped-map = applyInPandas; cogrouped-map is the
Spark-native form of a reduce over TWO keyed datasets, which the
reference's single-partition-array model cannot express at all —
mapreduce.h:44-83 admits one input file array).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "cogroup_clicks_before_purchase",
    oracle="""
        WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT user_id, MIN(ts) AS first_p FROM events
              WHERE event_type = 'purchase' GROUP BY user_id),
        cu AS (SELECT user_id, COUNT(*) AS n_clicks FROM c GROUP BY user_id),
        b AS (SELECT p.user_id, COUNT(c.ts) AS n_before
              FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts < p.first_p
              GROUP BY p.user_id)
        SELECT COALESCE(cu.user_id, b.user_id) AS user_id,
               COALESCE(cu.n_clicks, 0) AS n_clicks,
               b.user_id IS NOT NULL AS has_purchase,
               b.n_before
        FROM cu FULL OUTER JOIN b ON cu.user_id = b.user_id
    """,
    tags=("udf", "cogroup", "applyInPandas", "events"),
)
def cogroup_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user click/purchase reconciliation via a COGROUPED pandas
    operator: each user's click rows and purchase rows arrive as two
    Arrow-backed frames in one call, which counts total clicks and the
    clicks strictly before the first purchase (NULL when the user never
    purchased). Users present on either side appear — cogroup semantics,
    hash-checked against a full-outer-join SQL oracle.

    Scale design: cogroup shuffles both inputs once on the same user_id
    hash partitioning (two exchanges, one per input — no join
    materialization in between) and streams each user's pair of frames
    through the Python worker in Arrow batches. The Python path is the
    point here (API parity); the oracle shows the same logic stays
    expressible in pure SQL when performance demands it."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        n_clicks = len(left)
        if len(right):
            first_p = right["ts"].min()
            n_before = int((left["ts"] < first_p).sum()) if n_clicks else 0
            has = True
        else:
            n_before = None
            has = False
        return pd.DataFrame(
            {
                "user_id": pd.array([key[0]], dtype="Int64"),
                "n_clicks": pd.array([n_clicks], dtype="Int64"),
                "has_purchase": [has],
                "n_before": pd.array([n_before], dtype="Int64"),
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id bigint, n_clicks bigint, has_purchase boolean, n_before bigint",
        )
    )
