"""Pipeline batch 20: sequential-state analytics without Python.

``holt_linear_smoothing`` shows the repo's answer to "this metric is a
per-key linear recurrence" (Holt's double exponential smoothing —
level + trend, the workhorse short-horizon forecaster): fold the
ordered series inside a JVM ``aggregate`` over a collected array, so
the sequential scan is per-key parallel, codegen-compiled, and never
crosses into Python. The DuckDB twin executes the recurrence as a
recursive CTE stepping row-by-row — a genuinely independent evaluation
strategy over the identical IEEE operation order, so the final state
is bit-exact across engines before the display round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_ALPHA = 0.5  # level gain; dyadic so 0.5*x is exact scaling
_BETA = 0.5   # trend gain


@register(
    "holt_linear_smoothing",
    oracle=f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS idx,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ),
        s AS (
            SELECT user_id, idx, n,
                   value AS level,
                   CAST(0 AS DOUBLE) AS trend
            FROM seq WHERE idx = 1
            UNION ALL
            SELECT q.user_id, q.idx, s.n,
                   CAST({_ALPHA} AS DOUBLE) * q.value
                     + CAST({1 - _ALPHA} AS DOUBLE) * (s.level + s.trend),
                   CAST({_BETA} AS DOUBLE)
                     * ((CAST({_ALPHA} AS DOUBLE) * q.value
                         + CAST({1 - _ALPHA} AS DOUBLE) * (s.level + s.trend))
                        - s.level)
                     + CAST({1 - _BETA} AS DOUBLE) * s.trend
            FROM s JOIN seq q
              ON q.user_id = s.user_id AND q.idx = s.idx + 1
        )
        SELECT user_id,
               CAST(n AS BIGINT) AS n_events,
               CAST(FLOOR(level * 1000000.0 + 0.5) AS BIGINT) AS level_e6,
               CAST(FLOOR(trend * 1000000.0 + 0.5) AS BIGINT) AS trend_e6,
               CAST(FLOOR((level + trend) * 1000000.0 + 0.5) AS BIGINT) AS forecast_e6
        FROM s WHERE idx = n
    """,
    tags=("timeseries", "forecast", "fold", "events"),
)
def holt_linear_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing per user over the
    event-value series ordered by (ts, event_id), alpha = beta = 0.5:

        level_t = a*x_t + (1-a)*(level + trend)
        trend_t = b*(level_t - level) + (1-b)*trend,  level_1 = x_1, trend_1 = 0

    reported as the final state plus the one-step forecast
    (level + trend) — the short-horizon per-entity forecaster behind
    capacity alerts and anomaly baselines.

    Scale design: a linear recurrence cannot be windowed, but it CAN be
    folded — sort_array(collect_list(struct(ts, event_id, value))) then
    a JVM ``aggregate`` with a (level, trend) struct accumulator. No
    Python crossing, no UDF pickling; each user's fold is independent,
    so the job parallelizes across keys under ONE shuffle (the groupBy).
    The per-key series must fit one task — true for per-entity event
    history; for million-event keys you'd checkpoint partial state by
    time slice (the streaming variant's layout). The DuckDB oracle runs
    the same IEEE operation order as a recursive CTE — independent
    execution, bit-identical result.
    """
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias("arr")
    )
    vals = F.transform(F.col("arr"), lambda s: s["value"])
    g = g.select(
        "user_id",
        F.size("arr").cast("bigint").alias("n_events"),
        vals.alias("vals"),
    )
    rest = F.expr("slice(vals, 2, greatest(size(vals) - 1, 0))")
    init = F.struct(
        F.element_at(F.col("vals"), 1).alias("level"), F.lit(0.0).alias("trend")
    )
    a, one_a = F.lit(_ALPHA), F.lit(1 - _ALPHA)
    b, one_b = F.lit(_BETA), F.lit(1 - _BETA)

    def step(acc, x):
        new_level = a * x + one_a * (acc["level"] + acc["trend"])
        new_trend = b * (new_level - acc["level"]) + one_b * acc["trend"]
        return F.struct(new_level.alias("level"), new_trend.alias("trend"))

    folded = F.aggregate(rest, init, step)
    return g.select(
        "user_id",
        "n_events",
        grid(folded["level"], 6).alias("level_e6"),
        grid(folded["trend"], 6).alias("trend_e6"),
        grid(folded["level"] + folded["trend"], 6).alias("forecast_e6"),
    )


_PCA_DIM = 64
_PCA_ITERS = 600


def _pca_oracle() -> str:
    mv = " + ".join(f"g.mrow[{j}]*s.uvec[{j}]" for j in range(1, _PCA_DIM + 1))
    norm = " + ".join(f"uvec[{j}]*uvec[{j}]" for j in range(1, _PCA_DIM + 1))
    proj = " + ".join(
        f"CAST(qv[{j}] AS DOUBLE) * ((uvec[{j}] / nrm) * sg)"
        for j in range(1, _PCA_DIM + 1)
    )
    ones = ", ".join(["CAST(1 AS DOUBLE)"] * _PCA_DIM)
    return f"""
        WITH RECURSIVE q AS (
            SELECT vec_id, label,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(FLOOR(x * 10000) AS BIGINT)) AS qv
            FROM embeddings
        ),
        gram AS (
            SELECT gi.i AS i, gj.j AS j,
                   CAST(SUM(qv[gi.i + 1] * qv[gj.j + 1]) AS BIGINT) AS gsum
            FROM q,
                 generate_series(0, {_PCA_DIM - 1}) gi(i),
                 generate_series(0, {_PCA_DIM - 1}) gj(j)
            GROUP BY 1, 2
        ),
        mrows AS (
            SELECT i, list(CAST(gsum AS DOUBLE) / CAST({2**48} AS DOUBLE)
                           ORDER BY j) AS mrow
            FROM gram GROUP BY i
        ),
        s AS (
            SELECT 0 AS iter, [{ones}] AS uvec
            UNION ALL
            SELECT iter,
                   list_transform(raw,
                       x -> x / list_max(list_transform(raw, y -> abs(y)))) AS uvec
            FROM (
                SELECT s.iter + 1 AS iter,
                       (SELECT list({mv} ORDER BY g.i) FROM mrows g) AS raw
                FROM s WHERE s.iter < {_PCA_ITERS}
            )
        ),
        fin AS (SELECT uvec FROM s WHERE iter = {_PCA_ITERS}),
        no AS (SELECT uvec, sqrt({norm}) AS nrm FROM fin),
        sel AS (SELECT uvec, nrm,
                       (SELECT gs.i FROM generate_series(0, {_PCA_DIM - 1}) gs(i)
                        ORDER BY abs(uvec[gs.i + 1]) DESC, gs.i LIMIT 1) AS bi
                FROM no),
        un AS (SELECT uvec, nrm,
                      CASE WHEN uvec[bi + 1] < 0 THEN CAST(-1 AS DOUBLE)
                           ELSE CAST(1 AS DOUBLE) END AS sg
               FROM sel)
        SELECT vec_id, label,
               CAST(FLOOR(({proj}) / CAST(10000 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS proj_e6
        FROM q CROSS JOIN un
    """


@register(
    "pca_top_component",
    oracle=_pca_oracle(),
    tags=("embeddings", "pca", "iterative", "vectors"),
)
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection of every embedding onto the corpus's top principal
    direction (uncentered PCA / top singular direction) — the first step
    of whitening, spectral outlier pruning, and low-rank drift monitors.

    Scale design (operators/pca.py): the ONLY corpus-sized work is the
    exact integer Gram matrix (quantized components, one hash aggregate
    whose shuffle is dim^2 rows per task); the 64x64 result is a
    fixed-size reduction output, so collecting it to the driver is the
    reduce, not a data scan. The power iteration (600 steps, max-abs
    renormalized each step) runs on that tiny matrix in spelled
    left-fold order; the projection pass is one more pure map with the
    unit direction folded into the plan as literals. The DuckDB twin
    replays the identical arithmetic as a recursive CTE — bit-exact
    across engines, including the deterministic sign rule
    (largest-|component| positive, lowest index on ties).
    """
    from multithreaded_map_reduce_library_spark.operators.pca import (
        projection_expr,
        top_component_unit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    unit = top_component_unit(emb, "embedding", _PCA_DIM)
    proj = projection_expr("embedding", unit, _PCA_DIM)
    return emb.select(
        "vec_id", "label", grid(proj, 6).alias("proj_e6")
    )
