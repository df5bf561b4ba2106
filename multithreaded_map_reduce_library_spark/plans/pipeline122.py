"""Pipeline batch 122 (round 4): FK INTEGRITY AUDIT + PINBALL LOSS —
the whole-star referential-integrity sweep and the quantile-loss
forecast scorer:

* ``fk_integrity_audit`` — every foreign-key edge of the star schema
  (lineitem→orders, orders→customer, customer→nation,
  supplier→nation, nation→region) audited in one union: child row
  count, orphan count (left-anti), and the ok flag — the referential
  contract a warehouse enforces before trusting joins (and the reason
  the TPC-H queries can broadcast dimensions without null-handling).
* ``pinball_loss_seasonal_naive`` — the seasonal-naive forecast
  (ŷ_d = y_{d−7}) for daily purchase revenue, scored with the exact
  pinball (quantile) loss at q ∈ {10, 50, 90}: in integer cents,
  loss_q = q·(y−ŷ)/100 when y ≥ ŷ else (100−q)·(ŷ−y)/100, summed as
  exact integers (e2 per-term ratio) — how forecast quality is
  actually graded when over- and under-prediction cost differently.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no integrity or forecast tier; these extend the driver-mandated
superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import duck_int_ratio, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _duck_edge(child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
        SELECT '{child}->{parent}' AS fk_edge,
               CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child_rows,
               CAST((SELECT COUNT(*) FROM {child}
                     WHERE {ck} NOT IN (SELECT {pk} FROM {parent})) AS BIGINT)
                   AS n_orphans,
               (SELECT COUNT(*) FROM {child}
                WHERE {ck} NOT IN (SELECT {pk} FROM {parent})) = 0 AS integrity_ok
    """


@register(
    "fk_integrity_audit",
    oracle=" UNION ALL ".join(_duck_edge(*e) for e in _EDGES)
    + " ORDER BY fk_edge",
    tags=("quality", "integrity", "foreign-key", "star-schema"),
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep of all five star-schema FK edges:
    per edge the child row count, the orphan count via a LEFT ANTI
    join against the parent key set, and the pass flag. An engine that
    broadcasts dimensions (every TPC-H query here does) is implicitly
    assuming these are zero — this query makes the assumption a
    checked fact.

    Scale design: each orphan check is a left-anti join where the
    parent KEY projection broadcasts (dimensions) or, for the one
    fact-fact edge (lineitem→orders), shuffles only the key columns;
    counts partial-aggregate. Output is 5 rows."""
    rows = None
    for child, ck, parent, pk in _EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("__fk"))
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("__fk"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        edge = (
            c.join(F.broadcast(p), "__fk", "left")
            .agg(
                F.count("*").cast("bigint").alias("n_child_rows"),
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(f"{child}->{parent}").alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("integrity_ok"),
            )
        )
        rows = edge if rows is None else rows.unionByName(edge)
    return rows.orderBy("fk_edge")


@register(
    "pinball_loss_seasonal_naive",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        fc AS (
            SELECT day, y,
                   LAG(y, 7) OVER (ORDER BY day) AS yhat
            FROM daily
        ),
        scored AS (
            SELECT q.q, fc.day, fc.y, fc.yhat,
                   CASE WHEN fc.y >= fc.yhat
                        THEN {duck_int_ratio("q.q * (fc.y - fc.yhat)", "100", 2)}
                        ELSE {duck_int_ratio("(100 - q.q) * (fc.yhat - fc.y)", "100", 2)}
                   END AS loss_e2
            FROM (VALUES (10), (50), (90)) AS q(q)
            CROSS JOIN fc
            WHERE fc.yhat IS NOT NULL
        )
        SELECT q, CAST(COUNT(*) AS BIGINT) AS n_days_scored,
               CAST(SUM(loss_e2) AS BIGINT) AS total_pinball_e2,
               CAST((SUM(loss_e2) * 1 + COUNT(*) // 2) // COUNT(*) AS BIGINT)
                   AS mean_pinball_e2
        FROM scored GROUP BY q ORDER BY q
    """,
    tags=("timeseries", "forecast-eval", "pinball", "events", "global-sort"),
)
def pinball_loss_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the seasonal-naive forecast
    ŷ_d = y_{d−7} on daily purchase revenue, at q ∈ {10, 50, 90}: each
    day's loss is the exact e2-grid integer q·(y−ŷ)/100 (under-
    forecast) or (100−q)·(ŷ−y)/100 (over-forecast); totals and the
    half-up mean are integer arithmetic. q=50 is half the MAE; the
    10/90 pair is how asymmetric stockout-vs-overstock costs are
    scored. Complements `holt_linear_smoothing` / `kfold_cv_mae`.

    Scale design: one daily rollup, one LAG window on it, a 3×
    constant explode — all skinny."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("y")
        )
    )
    fc = daily.select(
        "day", "y", F.lag("y", 7).over(Window.orderBy("day")).alias("yhat")
    ).where(F.col("yhat").isNotNull())
    # quantile fan-out as a literal-array explode — no join node at all
    hundred = F.lit(100).cast("bigint")
    loss = F.when(
        F.col("y") >= F.col("yhat"),
        int_ratio(F.col("q") * (F.col("y") - F.col("yhat")), hundred, 2),
    ).otherwise(
        int_ratio((100 - F.col("q")) * (F.col("yhat") - F.col("y")), hundred, 2)
    )
    scored = fc.select(
        F.explode(F.array(F.lit(10), F.lit(50), F.lit(90))).alias("q"), "y", "yhat"
    ).select("q", loss.alias("loss_e2"))
    return (
        scored.groupBy("q")
        .agg(
            F.count("*").cast("bigint").alias("n_days_scored"),
            F.sum("loss_e2").cast("bigint").alias("total_pinball_e2"),
            F.call_function(
                "div",
                F.sum("loss_e2")
                + F.call_function("div", F.count("*"), F.lit(2).cast("bigint")),
                F.count("*").cast("bigint"),
            )
            .cast("bigint")
            .alias("mean_pinball_e2"),
        )
        .orderBy("q")
    )
