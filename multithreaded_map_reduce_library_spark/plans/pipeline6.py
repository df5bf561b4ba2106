"""Pipeline batch 6: time-series and graph primitives — per-entity EWMA
(ordered fold), hourly resampling with linear interpolation, weighted
Bernoulli document sampling, and triangle counting on the near-duplicate
candidate graph.

Reference parity note: none of these exist in the reference (its whole
surface is the five functions in ``mapreduce.h:44-83``). Cross-engine
float discipline (SCALING.md): folds run in identical left-to-right
order with +,* only; interpolation divides exact integer-derived
doubles; sampling thresholds use one IEEE multiply; one final ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "ewma_user_values",
    oracle="""
        WITH a AS (
            SELECT user_id,
                   list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events,
               CAST(FLOOR(list_reduce(vals,
                     (acc, x) -> acc * CAST(0.8 AS DOUBLE)
                                 + x * CAST(0.2 AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT) AS ewma_e4
        FROM a
    """,
    tags=("timeseries", "ewma", "fold", "events"),
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average (alpha=0.2) of event
    values, seeded with the first observation — the recursive smoother
    (monitoring, anomaly baselines) that windowed SUM cannot express
    because each step depends on the previous result.

    Both engines fold the identical (ts, event_id)-ordered list left to
    right with the same two IEEE ops, so the result is bit-deterministic.

    Scale design: one shuffle groups each user's events; the fold is a
    JVM-side higher-order ``aggregate`` over the collected array — a pure
    map after the groupBy, no Python. Per-user arrays are event counts per
    entity (bounded in practice); the streaming twin is
    applyInPandasWithState carrying (ewma) as state, same recurrence."""
    e = load_table(spark, sf_dir, "events")
    a = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("ts", "event_id", F.col("value").cast("double").alias("value"))
            )
        ).alias("rows"),
        F.count("*").alias("n_events"),
    )
    vals = F.transform(F.col("rows"), lambda s: s["value"])
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.8) + x * F.lit(0.2),
    )
    from multithreaded_map_reduce_library_spark.functions.grid import grid

    return a.select("user_id", "n_events", grid(ewma, 4).alias("ewma_e4"))


@register(
    "linear_interp_hourly",
    oracle="""
        WITH obs AS (
            SELECT user_id, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
                   CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS DOUBLE)
                       / CAST(10000 AS DOUBLE) AS v_obs
            FROM events GROUP BY 1, 2
        ),
        span AS (SELECT user_id, MIN(h) AS hmin, MAX(h) AS hmax
                 FROM obs GROUP BY user_id),
        grid AS (SELECT user_id, unnest(generate_series(hmin, hmax)) AS h
                 FROM span),
        g AS (SELECT grid.user_id, grid.h, obs.v_obs
              FROM grid LEFT JOIN obs USING (user_id, h)),
        w AS (
            SELECT user_id, h, v_obs,
                   last_value(v_obs IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
                   last_value(CASE WHEN v_obs IS NOT NULL THEN h END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY h
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hp,
                   first_value(v_obs IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
                   first_value(CASE WHEN v_obs IS NOT NULL THEN h END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY h
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS hn
            FROM g
        )
        SELECT user_id, h,
               -- expression rounding, NOT native ROUND: Spark round()
               -- goes through the double's shortest decimal repr while
               -- DuckDB rounds the exact binary value, and they disagree
               -- on boundary values; floor(x*1e6 + 0.5)/1e6 is the same
               -- IEEE op sequence in both engines -> identical bits
               FLOOR((CASE WHEN v_obs IS NOT NULL THEN v_obs
                    WHEN vp IS NULL THEN vn
                    WHEN vn IS NULL THEN vp
                    ELSE vp + (vn - vp) * (h - hp) / (hn - hp)
               END) * 1000000.0 + 0.5) / 1000000.0 AS v,
               CASE WHEN v_obs IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
        FROM w
    """,
    tags=("timeseries", "resample", "interpolation", "events"),
    bench=True,
)
def linear_interp_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: each user's irregular events become a dense
    hourly series over their active span; hours with observations carry
    the hourly mean, gaps are linearly interpolated between the previous
    and next observed hours (edges extend flat) — the alignment step
    before any cross-series model join, and the interpolating upgrade of
    the LOCF operator (``locf_gap_fill_daily``).

    Hourly means divide exact integer ten-thousandth sums, and the
    interpolation weight (h-hp)/(hn-hp) is a quotient of exact integers —
    all IEEE-deterministic.

    Scale design: the grid explodes to |user| x |active hours| rows but
    is generated (sequence), not shuffled; the only shuffles are the
    hourly partial agg and one (user, h) sort shared by all four
    IGNORE-NULLS window frames (forward and backward passes run on the
    same partitioning). At 100 TB spans are bounded per partition-day, so
    state never exceeds a user-day."""
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.select(
            "user_id",
            F.floor(
                F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600
            ).cast("long").alias("h"),
            F.floor(F.col("value") * 10000).cast("long").alias("q"),
        )
        .groupBy("user_id", "h")
        .agg((F.sum("q") / 10000.0).alias("v_obs"))
    )
    span = obs.groupBy("user_id").agg(
        F.min("h").alias("hmin"), F.max("h").alias("hmax")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("hmin", "hmax")).alias("h")
    )
    g = grid.join(obs, ["user_id", "h"], "left")
    back = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # Forward fill as a RUNNING last() over DESCENDING h: a
    # (currentRow, unboundedFollowing) first() frame is O(n^2) per
    # partition in Spark (the tail is re-scanned for every row); the
    # reversed running frame is O(n) at the cost of one extra local sort
    # on the same partitioning (measured 8x faster at sf0.1).
    fwd = Window.partitionBy("user_id").orderBy(F.col("h").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h_if_obs = F.when(F.col("v_obs").isNotNull(), F.col("h"))
    w = g.select(
        "user_id",
        "h",
        "v_obs",
        F.last("v_obs", ignorenulls=True).over(back).alias("vp"),
        F.last(h_if_obs, ignorenulls=True).over(back).alias("hp"),
        F.last("v_obs", ignorenulls=True).over(fwd).alias("vn"),
        F.last(h_if_obs, ignorenulls=True).over(fwd).alias("hn"),
    )
    v_raw = (
        F.when(F.col("v_obs").isNotNull(), F.col("v_obs"))
        .when(F.col("vp").isNull(), F.col("vn"))
        .when(F.col("vn").isNull(), F.col("vp"))
        .otherwise(
            F.col("vp")
            + (F.col("vn") - F.col("vp"))
            * (F.col("h") - F.col("hp"))
            / (F.col("hn") - F.col("hp"))
        )
    )
    # Expression rounding (floor(x*1e6+0.5)/1e6), NOT F.round: Spark's
    # round() rounds the double's shortest decimal repr (BigDecimal
    # .valueOf) while DuckDB rounds the exact binary value — they diverge
    # on boundary values; this op sequence is bit-identical cross-engine.
    v = F.floor(v_raw * 1000000.0 + F.lit(0.5)) / 1000000.0
    src = F.when(F.col("v_obs").isNotNull(), "obs").otherwise("interp")
    # v is emitted unrounded: every input is exact (integer sums, integer
    # hour gaps), so both engines produce bit-identical doubles — while a
    # 4-dp ROUND would sit exactly on half-way points (the interp grid is
    # rational) where Spark's string-based and DuckDB's numeric rounding
    # disagree.
    return w.select("user_id", "h", v.alias("v"), src.alias("src"))


@register(
    "weighted_bernoulli_sample_docs",
    oracle="""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
              < (n_chars / 1000.0) * 16777216.0
    """,
    tags=("sampling", "weighted", "deterministic", "documents"),
)
def weighted_bernoulli_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted Bernoulli sample of the corpus: each document is
    kept with probability proportional to its size (p = n_chars/1000),
    decided by comparing a 24-bit md5-derived uniform against the
    per-row threshold — the token-budget-aware downsampling a training
    mix uses so short and long documents contribute proportionally.

    Unlike rand(), the draw is a pure function of the key: stable across
    runs, engines, partitionings, and cluster sizes, and auditable (any
    row's inclusion can be re-derived). The comparison uses one IEEE
    multiply on exact integers — no transcendentals, so engines agree
    exactly.

    Scale design: a map-side-only predicate — no shuffle, full predicate
    evaluation inside the scan's codegen stage, and the parquet reader
    still prunes to the four referenced columns."""
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
        "long"
    )
    thr = (F.col("n_chars") / 1000.0) * 16777216.0
    return d.filter(u < thr).select("doc_id", "lang", "source", "n_chars")


def _neardup_edges_sql() -> str:
    from multithreaded_map_reduce_library_spark.plans.similarity_q import (
        _neardup_oracle,
    )

    return _neardup_oracle()


def _triangle_oracle() -> str:
    return f"""
        WITH edges AS (SELECT id_a, id_b FROM ({_neardup_edges_sql()}) x)
        SELECT e1.id_a AS v1, e1.id_b AS v2, e2.id_b AS v3
        FROM edges e1
        JOIN edges e2 ON e2.id_a = e1.id_b
        JOIN edges e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    """


@register(
    "triangle_count_dedup_graph",
    oracle=_triangle_oracle(),
    tags=("graph", "triangles", "dedup"),
)
def triangle_count_dedup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the embedding near-duplicate graph (the
    ``dedup_embedding_cosine`` edge set): v1<v2<v3 triples where all
    three pairs are near-duplicates. Triangle density distinguishes
    genuine duplicate *clusters* (cliquish) from chains of borderline
    pairs — the quality signal on top of connected components
    (``dedup_clusters``) and PageRank (``pagerank_dedup_graph``).

    Scale design: the standard two-join oriented enumeration over
    id_a<id_b edges — each triangle is produced exactly once, and the
    join keys (edge endpoints) shuffle only the edge list, never the
    vectors. At 100 TB the edge list is orders of magnitude smaller than
    the corpus (it already passed the LSH-bucket + cosine gate); degree
    skew is handled by AQE skew-join splitting."""
    from multithreaded_map_reduce_library_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    edges = embedding_neardup_pairs(emb, dim=64, threshold=0.3, num_planes=4).select(
        "id_a", "id_b"
    )
    e1 = edges.select(F.col("id_a").alias("v1"), F.col("id_b").alias("v2"))
    e2 = edges.select(F.col("id_a").alias("v2"), F.col("id_b").alias("v3"))
    e3 = edges.select(F.col("id_a").alias("v1"), F.col("id_b").alias("v3"))
    return e1.join(e2, "v2").join(e3, ["v1", "v3"]).select("v1", "v2", "v3")
