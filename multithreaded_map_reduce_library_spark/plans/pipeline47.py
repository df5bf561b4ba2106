"""Pipeline batch 47: the accumulating-snapshot warehouse pattern
(order lifecycle milestones in one row) and the language-centroid
cosine matrix (which languages' documents embed alike).

Centroid cosines work on QUANTIZED COMPONENT SUMS (cosine is
scale-invariant, so the un-divided sums give the identical angle while
staying exact BIGINTs); dot products and norms are integer arithmetic
until the final fixed-order sqrt/divide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "order_lifecycle_snapshot",
    oracle="""
        WITH l AS (
            SELECT l_orderkey,
                   MIN(CAST(l_shipdate AS DATE)) AS first_ship,
                   MAX(CAST(l_shipdate AS DATE)) AS last_ship,
                   COUNT(*) AS n_lines,
                   SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                       AS line_cents
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o.o_orderkey, o.o_orderstatus,
               l.n_lines, CAST(l.line_cents AS BIGINT) AS line_cents,
               (l.first_ship - CAST(o.o_orderdate AS DATE)) AS days_to_first_ship,
               (l.last_ship - l.first_ship) AS ship_span_days
        FROM orders o JOIN l ON o.o_orderkey = l.l_orderkey
    """,
    tags=("warehouse", "accumulating-snapshot", "orders", "lineitem"),
)
def order_lifecycle_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot fact: one row per order carrying its
    lifecycle milestones — line count, cent total, days from order to
    first shipment, and the shipping span — the Kimball pattern for
    processes with milestones (vs SCD for attribute history and
    transaction facts for events). Pure integer/date arithmetic.

    Scale design: one lineitem rollup keyed by l_orderkey joined to
    orders on the same key — co-located when both are bucketed by
    order key (the natural layout); nothing else.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    l = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship"),
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
        F.count("*").alias("n_lines"),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")
        ).alias("line_cents"),
    )
    return (
        orders.join(l, orders["o_orderkey"] == l["l_orderkey"])
        .select(
            "o_orderkey",
            "o_orderstatus",
            "n_lines",
            "line_cents",
            F.datediff("first_ship", F.to_date("o_orderdate")).alias(
                "days_to_first_ship"
            ),
            F.datediff("last_ship", "first_ship").alias("ship_span_days"),
        )
    )


_LC_DIM = 64


@register(
    "lang_centroid_similarity",
    oracle=f"""
        WITH j AS (
            SELECT d.lang, e.embedding
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        ),
        comp AS (
            SELECT lang, i,
                   SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5)
                            AS BIGINT)) AS s
            FROM j, UNNEST(generate_series(1, {_LC_DIM})) AS u(i)
            GROUP BY lang, i
        ),
        dots AS (
            SELECT a.lang AS lang_a, b.lang AS lang_b,
                   SUM(a.s * b.s) AS dot,
                   SUM(a.s * a.s) AS na,
                   SUM(b.s * b.s) AS nb
            FROM comp a JOIN comp b ON a.i = b.i AND a.lang < b.lang
            GROUP BY lang_a, lang_b
        )
        SELECT lang_a, lang_b,
               CAST(FLOOR(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE))
                                            * sqrt(CAST(nb AS DOUBLE)))
                          * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
        FROM dots
    """,
    tags=("embedding", "centroid", "similarity", "documents"),
)
def lang_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-language embedding centroids — do
    documents of different languages occupy the same region of
    embedding space (a diagnostic for whether embedding-based dedup or
    clustering will respect language boundaries). Centroids are kept as
    QUANTIZED COMPONENT SUMS: cosine is scale-invariant, so dividing by
    counts is unnecessary and every dot/norm stays an exact BIGINT; the
    ten pair cosines divide once each at display.

    Scale design: one (lang, dim) aggregate (64 x |langs| rows,
    map-side combined) and a dim-keyed self-join over that tiny
    relation — the corpus is scanned once.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    j = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select("lang", "embedding")
    comp = (
        j.select(
            "lang",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "x"),
        )
        .select(
            "lang",
            (F.col("i0") + 1).alias("i"),
            F.floor(F.col("x") * 10000.0 + 0.5).cast("bigint").alias("xq"),
        )
        .groupBy("lang", "i")
        .agg(F.sum("xq").alias("s"))
    )
    a = comp.select(
        F.col("lang").alias("lang_a"), "i", F.col("s").alias("sa")
    )
    b = comp.select(
        F.col("lang").alias("lang_b"), "i", F.col("s").alias("sb")
    )
    dots = (
        a.join(b, "i")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).alias("na"),
            F.sum(F.col("sb") * F.col("sb")).alias("nb"),
        )
    )
    return dots.select(
        "lang_a",
        "lang_b",
        grid(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            ),
            6,
        ).alias("cos_e6"),
    )
