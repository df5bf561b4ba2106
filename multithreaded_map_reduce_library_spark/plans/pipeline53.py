"""Pipeline batch 53: Wilson-score lower-bound ranking of return rates
— the canonical "don't sort by raw average" correction: a part with
2/2 returns must NOT outrank one with 15/60, and the Wilson interval's
lower bound is the standard fix (the Reddit/Evan Miller ranking). One
fixed-order IEEE expression per part over exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_WL_Z = 1.96
_WL_MIN_N = 20
_WL_TOPK = 20


@register(
    "wilson_return_rate_ranking",
    oracle=f"""
        WITH s AS (
            SELECT l_partkey, COUNT(*) AS n,
                   COUNT(*) FILTER (WHERE l_returnflag = 'R') AS r
            FROM lineitem GROUP BY l_partkey
            HAVING COUNT(*) >= {_WL_MIN_N}
        ),
        w AS (
            SELECT l_partkey, n, r,
                   ((CAST(r AS DOUBLE) / n + {_WL_Z} * {_WL_Z} / (2.0 * n))
                    - {_WL_Z} * sqrt((CAST(r AS DOUBLE) / n)
                                     * (1.0 - CAST(r AS DOUBLE) / n) / n
                                     + {_WL_Z} * {_WL_Z} / (4.0 * n * n)))
                   / (1.0 + {_WL_Z} * {_WL_Z} / n) AS lb
            FROM s
        )
        SELECT l_partkey, n, r,
               CAST((r * 1000000 + n // 2) // n AS BIGINT) AS rate_e6,
               CAST(FLOOR(lb * 1000000.0 + 0.5) AS BIGINT) AS wilson_lb_e6,
               CAST(ROW_NUMBER() OVER (ORDER BY lb DESC, l_partkey ASC)
                    AS BIGINT) AS rnk
        FROM w
        QUALIFY rnk <= {_WL_TOPK}
    """,
    tags=("statistics", "ranking", "wilson", "lineitem", "topk"),
)
def wilson_return_rate_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts ranked by the Wilson 95% lower bound of their return rate
    (min 20 lines): the uncertainty-aware ranking that keeps small-n
    flukes out of the top — raw rate rides along to show where the two
    orders disagree. The bound is one fixed-association IEEE expression
    over exact integer (n, r) pairs, identical in both engines; ranks
    carry partkey tiebreaks.

    Scale design: one part-keyed count aggregate (map-side combined),
    the bound as a map expression over |parts| rows, TakeOrdered
    top-20. The shape of every "rank by proportion, honestly" report.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = (
        li.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r"),
        )
        .where(F.col("n") >= _WL_MIN_N)
    )
    p = F.col("r").cast("double") / F.col("n")
    z = _WL_Z
    lb = (
        (p + z * z / (2.0 * F.col("n")))
        - z
        * F.sqrt(
            p * (1.0 - p) / F.col("n")
            + z * z / (4.0 * F.col("n") * F.col("n"))
        )
    ) / (1.0 + z * z / F.col("n"))
    w = s.select("l_partkey", "n", "r", lb.alias("lb"))
    ranked = w.withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.desc("lb"), F.asc("l_partkey")))
        .cast("bigint"),
    )
    return ranked.where(F.col("rnk") <= _WL_TOPK).select(
        "l_partkey",
        "n",
        "r",
        int_ratio(F.col("r"), F.col("n"), 6).alias("rate_e6"),
        grid(F.col("lb"), 6).alias("wilson_lb_e6"),
        "rnk",
    )
