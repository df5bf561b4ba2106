"""Pipeline batch 55: the source quality league table (per-source
share of high-quality documents, ranked by Wilson lower bound — the
data-vendor scorecard a corpus team uses to decide which feeds to
keep) and log-log price elasticity per part type.

Both compose earlier disciplines: the league reuses the composite
quality score's exact expression and the Wilson ranking; elasticity is
the zipf_alpha grid-log OLS over (ln unit price, ln quantity) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import (
    grid,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.pipeline import _duck_quality_sql
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table, scaled_broadcast

_SQ_GOOD = 0.75
_SQ_Z = 1.96


@register(
    "source_quality_league",
    oracle=f"""
        WITH q AS ({_duck_quality_sql()}),
        j AS (
            SELECT d.source, q.quality_e4
            FROM documents d JOIN q ON d.doc_id = q.doc_id
        ),
        s AS (
            SELECT source, COUNT(*) AS n,
                   COUNT(*) FILTER (WHERE quality_e4 >= {int(_SQ_GOOD * 10000)}) AS good
            FROM j GROUP BY source
        ),
        w AS (
            SELECT source, n, good,
                   ((CAST(good AS DOUBLE) / n + {_SQ_Z} * {_SQ_Z} / (2.0 * n))
                    - {_SQ_Z} * sqrt((CAST(good AS DOUBLE) / n)
                                     * (1.0 - CAST(good AS DOUBLE) / n) / n
                                     + {_SQ_Z} * {_SQ_Z} / (4.0 * n * n)))
                   / (1.0 + {_SQ_Z} * {_SQ_Z} / n) AS lb
            FROM s
        )
        SELECT source, n, good,
               CAST((good * 1000000 + n // 2) // n AS BIGINT) AS good_rate_e6,
               CAST(FLOOR(lb * 1000000.0 + 0.5) AS BIGINT) AS wilson_lb_e6,
               CAST(ROW_NUMBER() OVER (ORDER BY lb DESC, source ASC) AS BIGINT)
                   AS rnk
        FROM w
    """,
    tags=("quality", "sources", "league", "wilson", "documents"),
)
def source_quality_league(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source quality league: per source, the share of documents whose
    composite quality score (`doc_quality_score`'s exact expression)
    clears 0.75, ranked by the Wilson 95% lower bound — so a source
    with 3 good docs out of 3 cannot outrank one with 20/25. The
    data-vendor scorecard behind "which feeds do we keep at the next
    crawl". Oracle replays scoring, thresholding, and the ranking.

    Scale design: the quality score is a map-side expression; the
    league is one source-keyed count aggregate + a |sources|-row
    ranking window.
    """
    from multithreaded_map_reduce_library_spark.operators import textstats as T

    docs = load_table(spark, sf_dir, "documents")
    j = docs.select(
        "source", grid(T.quality_score("text"), 4).alias("quality_e4")
    )
    s = j.groupBy("source").agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("quality_e4") >= int(_SQ_GOOD * 10000), 1)).alias(
            "good"
        ),
    )
    p = F.col("good").cast("double") / F.col("n")
    z = _SQ_Z
    lb = (
        (p + z * z / (2.0 * F.col("n")))
        - z
        * F.sqrt(
            p * (1.0 - p) / F.col("n") + z * z / (4.0 * F.col("n") * F.col("n"))
        )
    ) / (1.0 + z * z / F.col("n"))
    w = s.select("source", "n", "good", lb.alias("lb"))
    return (
        w.withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("lb"), F.asc("source")))
            .cast("bigint"),
        )
        .select(
            "source",
            "n",
            "good",
            int_ratio(F.col("good"), F.col("n"), 6).alias("good_rate_e6"),
            grid(F.col("lb"), 6).alias("wilson_lb_e6"),
            "rnk",
        )
    )


@register(
    "price_elasticity_by_type",
    oracle="""
        WITH l AS (
            SELECT p.p_type,
                   CAST(FLOOR(ln(l.l_extendedprice / l.l_quantity)
                              * 10000.0 + 0.5) AS BIGINT) AS x_q,
                   CAST(FLOOR(ln(CAST(l.l_quantity AS DOUBLE))
                              * 10000.0 + 0.5) AS BIGINT) AS y_q
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
        ),
        s AS (
            SELECT p_type, COUNT(*) AS n, SUM(x_q) AS sx, SUM(y_q) AS sy,
                   SUM(x_q * y_q) AS sxy, SUM(x_q * x_q) AS sxx
            FROM l GROUP BY p_type
        )
        SELECT p_type, n,
               CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1000000.0 + 0.5) AS BIGINT) AS elasticity_e6
        FROM s WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
    """,
    tags=("statistics", "elasticity", "regression", "lineitem"),
)
def price_elasticity_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of quantity per part type: the OLS
    slope of ln(quantity) on ln(unit price) — the economics workhorse
    (slope ~ -1 means demand drops 1% per 1% price increase; synthetic
    data will sit near 0, which is itself the diagnostic). Grid-
    quantized logs feed exact-integer sufficient statistics (the
    zipf_alpha_fit pattern).

    Scale design: one broadcast part join + a per-type aggregate of
    five BIGINT sums — sufficient-statistics regression, any group
    count. Magnitudes: |log grids| <= ~1.2e5, squares <= 1.5e10,
    sums at sf0.1 <= ~1e16 — inside int64; the n*sxy-style PRODUCTS
    are formed in double (they exceed int64), exactly as the oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    l = (
        li.where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(scaled_broadcast(part.select("p_partkey", "p_type"), sf_dir, "part"),
              li["l_partkey"] == part["p_partkey"])
        .select(
            "p_type",
            F.floor(
                F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 10000.0 + 0.5
            )
            .cast("bigint")
            .alias("x_q"),
            F.floor(F.log(F.col("l_quantity").cast("double")) * 10000.0 + 0.5)
            .cast("bigint")
            .alias("y_q"),
        )
    )
    s = l.groupBy("p_type").agg(
        F.count("*").alias("n"),
        F.sum("x_q").alias("sx"),
        F.sum("y_q").alias("sy"),
        F.sum(F.col("x_q") * F.col("y_q")).alias("sxy"),
        F.sum(F.col("x_q") * F.col("x_q")).alias("sxx"),
    )
    # Products are formed in DOUBLE from the exact integer sums: n*sxy
    # overflows int64 at sf0.1 group sizes, and doubles-from-exact-ints
    # are bit-identical in both engines (grid rule), so the slope and
    # its positivity guard stay deterministic.
    n_d = F.col("n").cast("double")
    den = n_d * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    num = n_d * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    return s.where(den > 0).select(
        "p_type",
        "n",
        grid(num / den, 6).alias("elasticity_e6"),
    )
