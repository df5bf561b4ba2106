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

from multithreaded_map_reduce_library_spark.functions.grid import grid
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


_RECURSIVE_SQL = """
    WITH RECURSIVE anc(user_id, anc_id, depth) AS (
        SELECT user_id, user_id, 0
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id >= 1) u
        UNION ALL
        SELECT user_id, CAST(FLOOR(anc_id / 2.0) AS BIGINT), depth + 1
        FROM anc WHERE anc_id > 1
    )
    SELECT user_id, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
           COUNT(*) AS n_ancestors
    FROM anc GROUP BY user_id
"""


@register(
    "sql_recursive_user_ancestry",
    oracle=_RECURSIVE_SQL,
    tags=("sql-api", "recursive-cte", "iterative", "hierarchy"),
)
def sql_recursive_user_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE in the engine's SQL surface (Spark 4 recursive
    CTEs): walk each user id up the implicit binary hierarchy
    (parent = floor(id/2)) to the root, reporting depth and ancestor
    count — the org-chart/BOM traversal pattern, expressed in ONE ANSI
    string that both Catalyst and the DuckDB oracle execute (the
    dedup-clusters oracle already used a recursive CTE; this puts the
    construct in the engine itself). floor(x/2.0) is used instead of
    integer div so the same text parses in both dialects.

    Scale design: each recursion step is a distributed self-join on the
    frontier only (rows still above the root), and depth is bounded by
    log2(max id) — the same bounded-iteration shape as connected
    components, but planned by Catalyst's UnionLoop instead of a Python
    driver loop."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_RECURSIVE_SQL)


@register(
    "grouped_agg_trimmed_mean",
    oracle="""
        WITH q AS (SELECT event_type,
                          CAST(FLOOR(value * 10000) AS BIGINT) AS v
                   FROM events),
        r AS (SELECT event_type, v,
                     ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM q)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST((CAST(SUM(v) AS BIGINT) * 100 + COUNT(*) // 2) // COUNT(*) AS BIGINT) AS trimmed_mean_e6
        FROM r
        WHERE rn > n // 10 AND rn <= n - n // 10
        GROUP BY event_type
    """,
    tags=("udf", "pandas", "grouped-agg", "udaf", "events"),
)
def grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via a GROUPED_AGG pandas_udf: the 10%-trimmed mean of
    event values per type (drop the lowest and highest decile by count,
    average the rest) — the robust-statistics reduction built-ins don't
    offer, in the vectorized Arrow form (whole group as one pandas
    Series, returns a scalar). Values are quantized to integer
    ten-thousandths before the UDAF so the trim boundary and the sum are
    engine-exact; equal values are interchangeable under positional
    trimming, so no tiebreak is needed.

    Scale design: GROUPED_AGG ships each group once through the Python
    worker (Arrow-batched). The oracle shows the same trim as pure
    window SQL — the JVM-only fallback when a group is too large for one
    worker (at 100 TB, pre-aggregate or use the SQL form)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses postponed annotation
    # evaluation, which defeats pandas_udf's signature-based inference.
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def trimmed_mean_e6(v):
        s = v.sort_values().to_numpy()
        k = len(s) // 10
        kept = s[k : len(s) - k]
        # exact integer half-up mean on the e6 grid (grid rule): values
        # are e4 ints, so *100 scales the mean to e6.
        tot = int(kept.sum()) * 100
        n = len(kept)
        return (tot + n // 2) // n

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def kept_count(v):
        return int(len(v) - 2 * (len(v) // 10))

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 10000).cast("long").alias("v")
    )
    return e.groupBy("event_type").agg(
        kept_count("v").alias("n_kept"),
        trimmed_mean_e6("v").alias("trimmed_mean_e6"),
    )
