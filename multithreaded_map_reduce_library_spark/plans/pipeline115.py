"""Pipeline batch 115 (round 4): V-OPTIMAL HISTOGRAM / JENKS NATURAL
BREAKS — the optimal-synopsis primitive behind v-optimal histograms
(Jagadish et al., VLDB'98) and 1-D optimal k-means:

``voptimal_histogram_daily`` — partition the 30-day daily-revenue
series into 4 CONTIGUOUS buckets minimizing total within-bucket SSE,
by exact dynamic programming: interval costs
SSE(j+1..i) = (Q_i−Q_j) − (P_i−P_j)²/(i−j) come from integer prefix
sums (revenue in whole dollars so squares stay int64-exact), each cost
is rounded once to an integer, and the 4 DP layers are plain joins
with a deterministic argmin (cost, then smaller split). The optimal
boundaries are reconstructed by a 3-step walk-back. Unlike the
equi-depth histogram already registered, bucket WIDTHS adapt to where
the series varies — the synopsis a cost-based optimizer or a
changepoint report actually wants.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no synopsis tier; this extends the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_K = 4

_DUCK_PRE = """
        daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST((SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                             ELSE 0 END) + 50) // 100 AS BIGINT) AS v
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT day, v, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
            FROM daily
        ),
        pre0 AS (
            SELECT i, day,
                   CAST(SUM(v) OVER (ORDER BY i) AS BIGINT) AS p,
                   CAST(SUM(v * v) OVER (ORDER BY i) AS BIGINT) AS q
            FROM idx
        ),
        pre AS (
            SELECT * FROM pre0
            UNION ALL SELECT 0, NULL, 0, 0
        ),
        nn AS (SELECT CAST(MAX(i) AS BIGINT) AS n FROM pre),
        ivals AS (
            SELECT j.i AS j, i.i AS i,
                   CAST(FLOOR(
                       (i.q - j.q)
                       - CAST(i.p - j.p AS DOUBLE) * (i.p - j.p) / (i.i - j.i)
                       + 0.5) AS BIGINT) AS c
            FROM pre j JOIN pre i ON j.i < i.i
        )
"""


def _duck_dp_layer(k: int) -> str:
    """dp{k}(i) = min over j of dp{k-1}(j) + cost(j+1..i), argmin kept."""
    prev = f"dp{k - 1}"
    return f"""
        dp{k} AS (
            SELECT i, v, j FROM (
                SELECT iv.i, {prev}.v + iv.c AS v, iv.j,
                       ROW_NUMBER() OVER (PARTITION BY iv.i
                                          ORDER BY {prev}.v + iv.c, iv.j) AS rn
                FROM ivals iv JOIN {prev} ON {prev}.i = iv.j
                WHERE iv.j >= {k - 1}
            ) WHERE rn = 1
        )"""


@register(
    "voptimal_histogram_daily",
    oracle=f"""
        WITH {_DUCK_PRE},
        dp1 AS (
            SELECT i, c AS v, CAST(0 AS BIGINT) AS j FROM ivals WHERE j = 0
        ),
        {",".join(_duck_dp_layer(k) for k in range(2, _K + 1))},
        b3 AS (SELECT dp4.j AS e FROM dp4 CROSS JOIN nn WHERE dp4.i = nn.n),
        b2 AS (SELECT dp3.j AS e FROM dp3 JOIN b3 ON dp3.i = b3.e),
        b1 AS (SELECT dp2.j AS e FROM dp2 JOIN b2 ON dp2.i = b2.e),
        edges AS (
            SELECT 1 AS bucket_id, CAST(1 AS BIGINT) AS i_start, b1.e AS i_end
            FROM b1
            UNION ALL
            SELECT 2, b1.e + 1, b2.e FROM b1 CROSS JOIN b2
            UNION ALL
            SELECT 3, b2.e + 1, b3.e FROM b2 CROSS JOIN b3
            UNION ALL
            SELECT 4, b3.e + 1, nn.n FROM b3 CROSS JOIN nn
        )
        SELECT e.bucket_id,
               ds.day AS start_day, de.day AS end_day,
               e.i_end - e.i_start + 1 AS n_days,
               iv.c AS bucket_sse
        FROM edges e
        JOIN pre0 ds ON ds.i = e.i_start
        JOIN pre0 de ON de.i = e.i_end
        JOIN ivals iv ON iv.j = e.i_start - 1 AND iv.i = e.i_end
        ORDER BY e.bucket_id
    """,
    # "cross": the boundary walk-back assembles 4 edge rows from one-row
    # aggregates via intentional 1x1 cross joins
    tags=("olap", "histogram", "v-optimal", "dp", "events", "global-sort", "cross"),
)
def voptimal_histogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal 4-bucket contiguous partition of the daily purchase-
    revenue series (whole dollars) minimizing total within-bucket SSE —
    the v-optimal histogram / Jenks natural breaks, solved EXACTLY by
    4 DP layers over the 465 interval costs of the 30-point series,
    each layer a join + deterministic argmin (cost, then smaller
    split), boundaries recovered by a 3-step walk-back.

    Scale design: the DP runs on the |days|² interval relation of the
    DAILY rollup — the calendar bounds it (a year: 66 k intervals),
    never the corpus; the corpus is touched once for the rollup.
    Production v-optimal on finer grids pre-buckets to ≤ 512 leaves
    first (the equi-depth query), identical DP after."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.expr(
                "CAST((SUM(CASE WHEN event_type = 'purchase'"
                " THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)"
                " ELSE 0 END) + 50) DIV 100 AS BIGINT)"
            ).alias("v")
        )
    )
    idx = daily.select(
        "day", "v", F.row_number().over(Window.orderBy("day")).cast("bigint").alias("i")
    )
    wc = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    pre0 = idx.select(
        "i",
        "day",
        F.sum("v").over(wc).cast("bigint").alias("p"),
        F.sum(F.col("v") * F.col("v")).over(wc).cast("bigint").alias("q"),
    )
    sentinel = pre0.sparkSession.createDataFrame(
        [(0, None, 0, 0)], "i bigint, day date, p bigint, q bigint"
    )
    # |days|+1 rows: single partition keeps every DP join task-light
    pre = pre0.unionByName(sentinel).coalesce(1).localCheckpoint()
    nn = pre.agg(F.max("i").cast("bigint").alias("n"))
    jj = pre.select(
        F.col("i").alias("j"), F.col("p").alias("jp"), F.col("q").alias("jq")
    )
    ii = pre.select(F.col("i").alias("i"), F.col("p").alias("ip"), F.col("q").alias("iq"))
    dp_cost = F.floor(
        (F.col("iq") - F.col("jq")).cast("double")
        - (F.col("ip") - F.col("jp")).cast("double")
        * (F.col("ip") - F.col("jp"))
        / (F.col("i") - F.col("j"))
        + F.lit(0.5)
    ).cast("bigint")
    ivals = (
        jj.join(ii, F.col("j") < F.col("i")).select("j", "i", dp_cost.alias("c"))
    ).coalesce(1).localCheckpoint()
    # DP layers retained for the boundary walk-back (cheap at |days| scale)
    dp1 = ivals.where(F.col("j") == 0).select(
        "i", F.col("c").alias("v"), F.lit(0).cast("bigint").alias("j")
    )
    layers = {1: dp1}
    for k in range(2, _K + 1):
        cand = (
            ivals.where(F.col("j") >= k - 1)
            .join(
                layers[k - 1].select(F.col("i").alias("j"), F.col("v").alias("pv")),
                "j",
            )
            .select("i", (F.col("pv") + F.col("c")).alias("v"), "j")
        )
        wmin = Window.partitionBy("i").orderBy("v", "j")
        layers[k] = (
            cand.withColumn("rn", F.row_number().over(wmin))
            .where(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint()
        )
    b3 = (
        layers[4]
        .join(F.broadcast(nn), F.col("i") == F.col("n"))
        .select(F.col("j").alias("e3"))
    )
    b2 = (
        layers[3]
        .join(F.broadcast(b3), F.col("i") == F.col("e3"))
        .select(F.col("j").alias("e2"))
    )
    b1 = (
        layers[2]
        .join(F.broadcast(b2), F.col("i") == F.col("e2"))
        .select(F.col("j").alias("e1"))
    )
    edges = (
        b1.select(
            F.lit(1).alias("bucket_id"),
            F.lit(1).cast("bigint").alias("i_start"),
            F.col("e1").alias("i_end"),
        )
        .unionByName(
            b1.crossJoin(b2).select(
                F.lit(2).alias("bucket_id"),
                (F.col("e1") + 1).alias("i_start"),
                F.col("e2").alias("i_end"),
            )
        )
        .unionByName(
            b2.crossJoin(b3).select(
                F.lit(3).alias("bucket_id"),
                (F.col("e2") + 1).alias("i_start"),
                F.col("e3").alias("i_end"),
            )
        )
        .unionByName(
            b3.crossJoin(nn).select(
                F.lit(4).alias("bucket_id"),
                (F.col("e3") + 1).alias("i_start"),
                F.col("n").alias("i_end"),
            )
        )
    )
    ds = pre0.select(F.col("i").alias("i_start"), F.col("day").alias("start_day"))
    de = pre0.select(F.col("i").alias("i_end"), F.col("day").alias("end_day"))
    return (
        edges.join(ds, "i_start")
        .join(de, "i_end")
        .join(
            ivals.select(
                (F.col("j") + 1).alias("i_start"),
                F.col("i").alias("i_end"),
                F.col("c").alias("bucket_sse"),
            ),
            ["i_start", "i_end"],
        )
        .select(
            "bucket_id",
            "start_day",
            "end_day",
            (F.col("i_end") - F.col("i_start") + 1).cast("bigint").alias("n_days"),
            "bucket_sse",
        )
        .orderBy("bucket_id")
    )
