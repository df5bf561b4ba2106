"""Pipeline batch 50: content-defined chunking statistics (the
rolling-hash cut-point primitive behind dedup storage and rsync-style
delta sync) and the hour x weekday activity index heatmap.

The CDC hash is a 4-character polynomial (djb2-style, base 33) over
ASCII codes mod 64 — pure integer arithmetic per position, identical
in both engines with zero hashing libraries involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import grid, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_CDC_W = 4     # rolling window chars
_CDC_MOD = 64  # expected chunk length ~64 chars


@register(
    "cdc_chunk_boundaries",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, length(text) AS n, i,
                   ((ascii(substr(text, i, 1)) * 33 * 33 * 33
                     + ascii(substr(text, i + 1, 1)) * 33 * 33
                     + ascii(substr(text, i + 2, 1)) * 33
                     + ascii(substr(text, i + 3, 1))) % {_CDC_MOD}) AS h
            FROM documents,
                 UNNEST(generate_series(1, length(text) - {_CDC_W - 1})) AS u(i)
            WHERE length(text) >= {_CDC_W}
        )
        SELECT doc_id, MAX(n) AS n_chars,
               1 + COUNT(*) FILTER (WHERE h = 0) AS n_chunks,
               CAST(MAX(n) AS DOUBLE)
                   / (1 + COUNT(*) FILTER (WHERE h = 0)) AS mean_chunk_len
        FROM pos GROUP BY doc_id
    """,
    tags=("storage", "cdc", "chunking", "documents"),
)
def cdc_chunk_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking audit: cut points where the 4-char
    polynomial rolling hash (base 33, mod 64) hits zero — the
    boundary-insensitive chunking behind dedup storage, rsync, and
    backup systems (insert one byte and only the surrounding chunk's
    boundaries move, unlike fixed-size blocks). Output: per document,
    chunk count and mean chunk length (expected ~64 chars by the mod).

    Scale design: per-position hashing is a map-side transform over the
    character sequence (no shuffle; positions never materialize beyond
    the per-row array in Spark), then one doc-keyed count. 100 TB of
    text streams through codegen; the chunk table is what a dedup
    store would build its content-address index from.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    h = lambda i: (  # noqa: E731
        F.ascii(F.col("text").substr(i, F.lit(1))) * (33 * 33 * 33)
        + F.ascii(F.col("text").substr(i + 1, F.lit(1))) * (33 * 33)
        + F.ascii(F.col("text").substr(i + 2, F.lit(1))) * 33
        + F.ascii(F.col("text").substr(i + 3, F.lit(1)))
    ) % _CDC_MOD
    cuts = F.size(
        F.filter(
            F.transform(F.sequence(F.lit(1), n - (_CDC_W - 1)), lambda i: h(i)),
            lambda x: x == 0,
        )
    )
    return (
        docs.where(n >= _CDC_W)
        .select(
            "doc_id",
            n.cast("bigint").alias("n_chars"),
            (1 + cuts).cast("bigint").alias("n_chunks"),
            (n.cast("double") / (1 + cuts)).alias("mean_chunk_len"),
        )
    )


@register(
    "hour_weekday_activity_index",
    oracle="""
        WITH c AS (
            SELECT dayofweek(CAST(ts AS DATE)) + 1 AS weekday,
                   hour(ts) AS hod, COUNT(*) AS n
            FROM events GROUP BY weekday, hod
        ),
        g AS (SELECT SUM(n) AS tot, COUNT(*) AS n_cells FROM c)
        SELECT c.weekday, c.hod, c.n,
               CAST((c.n * g.n_cells * 1000000 + CAST(g.tot AS BIGINT) // 2)
                    // CAST(g.tot AS BIGINT) AS BIGINT) AS activity_index_e6
        FROM c CROSS JOIN g
    """,
    tags=("time-series", "seasonality", "heatmap", "events"),
)
def hour_weekday_activity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x weekday activity heatmap: each of the (up to) 168
    cells' event count relative to the all-cell mean — the interaction
    view completing the seasonality pair (`weekday_seasonal_index` is
    its weekday margin). One exact-integer-product division per cell.

    Scale design: a 168-cell rollup with map-side combine plus a 1-row
    total broadcast; the heatmap every ops dashboard renders.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.dayofweek(F.to_date("ts")).alias("weekday"), F.hour("ts").alias("hod")
    ).agg(F.count("*").alias("n"))
    g = c.agg(F.sum("n").alias("tot"), F.count("*").alias("n_cells"))
    return c.crossJoin(F.broadcast(g)).select(
        "weekday",
        "hod",
        "n",
        int_ratio(F.col("n") * F.col("n_cells"), F.col("tot"), 6).alias(
            "activity_index_e6"
        ),
    )
