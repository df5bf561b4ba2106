"""Analytics and data-quality operators: anomaly detection, time-weighted
aggregation, session statistics, deterministic sampling, per-document
repetition metrics (Gopher-style quality filters), and k-means-style
centroid assignment.

Reference parity note: none of these exist in the reference (its only
aggregate is COUNT(*) per key, distwc.c:26-30; SURVEY.md §2.2 records the
absences) — they extend the engine along the driver's training-data
pipeline axis: repetition metrics are the standard pre-training quality
filters, deterministic sampling is how a 100 TB corpus is subsetted
reproducibly, and centroid assignment is the building block of IVF
indexing and embedding clustering.

Cross-engine numeric discipline (round-3 grid rule, functions/grid.py):
every displayed value is an exact integer — counts, microsecond sums,
per-item-quantized value sums (_e2 cents), and half-up integer ratios
(_e4/_e6 scales). Derived doubles (z-scores, cosines) are computed from
exact integer inputs with the same IEEE expression in both engines, then
quantized per item before any aggregate display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    grid,
    gsum,
    int_ratio,
    int_ratio_big,
)
from multithreaded_map_reduce_library_spark.functions.vectors import cosine
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.plans.similarity_q import _dot
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "events_zscore_anomalies",
    oracle="""
        WITH q AS (SELECT event_type, user_id,
                          CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
                   FROM events),
        s AS (SELECT event_type, v,
                     COUNT(*) OVER (PARTITION BY user_id) AS n,
                     CAST(SUM(v)   OVER (PARTITION BY user_id) AS BIGINT) AS s1,
                     CAST(SUM(v*v) OVER (PARTITION BY user_id) AS BIGINT) AS s2
              FROM q),
        z AS (SELECT event_type,
                     ABS(CAST(v AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)) AS zv
              FROM s WHERE n > 1 AND n*s2 - s1*s1 > 0)
        SELECT event_type, COUNT(*) AS n_anomalies,
               CAST((SUM(CAST(FLOOR(zv * 10000.0 + 0.5) AS BIGINT)) + COUNT(*) // 2)
                    // COUNT(*) AS BIGINT) AS avg_abs_z_e4
        FROM z WHERE zv > 2
        GROUP BY event_type
    """,
    tags=("events", "window", "anomaly", "stats"),
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly detection: an unordered window (no sort —
    just one hash shuffle on user_id) attaches each user's mean and
    sample stddev, |z| > 2 flags outliers, counted per event type. At
    100 TB the user_id shuffle is the only data movement; the per-user
    moments could equally come from a pre-aggregated broadcast profile
    table when users << events.

    Determinism: the per-user moments are derived from EXACT integer-cent
    sums (n, Σv, Σv²) — stddev_samp = sqrt((nΣv²-(Σv)²)/(n(n-1))) — so
    mu/sd/z are the same IEEE doubles in both engines (a raw double
    AVG/STDDEV's low bits depend on summation order); z is quantized per
    item before the displayed average (grid rule)."""
    e = load_table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("user_id")
    d = e.select(
        "event_type",
        v.alias("v"),
        F.count("*").over(w).alias("n"),
        F.sum(v).over(w).alias("s1"),
        F.sum(v * v).over(w).alias("s2"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    z = F.abs(
        F.col("v").cast("double") - F.col("s1").cast("double") / F.col("n").cast("double")
    ) / F.sqrt(
        var_num.cast("double") / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    z_e4 = F.floor(z * 10000.0 + F.lit(0.5)).cast("bigint")
    return (
        d.filter((F.col("n") > 1) & (var_num > 0))
        .select("event_type", z.alias("zv"), z_e4.alias("z_e4"))
        .filter(F.col("zv") > 2)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_anomalies"),
            int_ratio(F.sum("z_e4"), F.count("*"), 0).alias("avg_abs_z_e4"),
        )
    )


@register(
    "events_time_weighted_avg",
    oracle="""
        WITH d AS (
            SELECT user_id, value,
                   date_diff('microseconds', ts,
                             LEAD(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)) AS dt_us
            FROM events
        )
        SELECT user_id,
               CAST((SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) * dt_us)
                       // SUM(dt_us)) * 100
                    + ((SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) * dt_us)
                        % SUM(dt_us)) * 100 + SUM(dt_us) // 2) // SUM(dt_us)
                    AS BIGINT) AS twa_value_e4,
               COUNT(*) AS n_intervals
        FROM d
        WHERE dt_us IS NOT NULL AND dt_us > 0
        GROUP BY user_id
    """,
    tags=("events", "window", "time-weighted"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user (TimescaleDB-style
    ``time_weight``): each reading is held until the next one, weighted
    by its holding duration. Durations are exact integer microseconds
    and values are quantized to exact integer cents per item, so the
    weighted sum is pure BIGINT arithmetic in both engines and the
    displayed mean is an exact half-up integer ratio (grid rule). One
    sort-window on user_id, then the group-by reuses the same
    partitioning."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_us = F.unix_micros(F.lead("ts").over(w).cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    v_e2 = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    return (
        e.select("user_id", v_e2.alias("v_e2"), dt_us.alias("dt_us"))
        .filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        .groupBy("user_id")
        .agg(
            int_ratio_big(
                F.sum(F.col("v_e2") * F.col("dt_us")), F.sum("dt_us"), 2
            ).alias("twa_value_e4"),
            F.count("*").alias("n_intervals"),
        )
    )


@register(
    "events_session_stats",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                        WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1
                        ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sid AS (
            SELECT user_id, ts,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM g
        ),
        sess AS (
            SELECT user_id, sess_id, COUNT(*) AS n_events,
                   date_diff('microseconds', MIN(ts), MAX(ts)) AS dur_us
            FROM sid GROUP BY user_id, sess_id
        )
        SELECT user_id,
               COUNT(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
               CAST(MAX(n_events) AS BIGINT) AS max_sess_events
        FROM sess GROUP BY user_id
    """,
    tags=("events", "sessionize", "window"),
    bench=True,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sessionization: gap detection (30-min inactivity) assigns
    session ids via a running sum, then per-session extents roll up to
    per-user session counts and total in-session dwell time. All outputs
    are exact integers (microsecond durations), so the cross-engine hash
    is bit-exact. One shuffle on user_id serves the lag window, the
    running-sum window, and both group-bys."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL '30' MINUTE")), 1
    ).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    sess = (
        e.select("user_id", "ts", sess_id.alias("sess_id"))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(us("ts")) - F.min(us("ts"))).alias("dur_us"),
        )
    )
    return sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum("dur_us").alias("total_dur_us"),
        F.max("n_events").alias("max_sess_events"),
    )


@register(
    "deterministic_sample_event_stats",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e2
        FROM events
        WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 1) = '0'
        GROUP BY event_type
    """,
    tags=("sampling", "deterministic", "events"),
)
def deterministic_sample_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~1/16 user-level sample: keep users whose md5 hex
    digest starts with '0'. Unlike ``TABLESAMPLE``/``rand()``, the sample
    is a pure function of the key — stable across runs, engines, and
    cluster sizes, and it samples whole users (all-or-nothing), which is
    what an unbiased per-entity metric needs. At 100 TB this predicate
    is map-side only: no shuffle is added and the parquet scan still
    prunes columns."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) == "0")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            gsum(F.col("value"), 2).alias("sum_value_e2"),
        )
    )


@register(
    "doc_repetition_quality",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
        pt AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                      COUNT(*) AS n_distinct, MAX(c) AS top_tok
               FROM tc GROUP BY doc_id),
        bg AS (SELECT doc_id,
                      unnest(list_transform(generate_series(1, len(toks) - 1),
                                            i -> toks[i] || ' ' || toks[i + 1])) AS b
               FROM t),
        bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
        pb AS (SELECT doc_id, MAX(c) AS top_bg FROM bc GROUP BY doc_id)
        SELECT pt.doc_id, n_tokens,
               CAST((n_distinct * 10000 + n_tokens // 2) // n_tokens AS BIGINT) AS type_token_ratio_e4,
               CAST((top_tok * 10000 + n_tokens // 2) // n_tokens AS BIGINT) AS top_token_frac_e4,
               CAST((top_bg * 10000 + (n_tokens - 1) // 2) // (n_tokens - 1) AS BIGINT) AS top_bigram_frac_e4
        FROM pt JOIN pb ON pt.doc_id = pb.doc_id
    """,
    tags=("documents", "quality", "repetition", "text-analysis"),
    bench=True,
)
def doc_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters per document: type-token ratio,
    most-frequent-token share, and most-frequent-bigram share — the
    standard signals for machine-generated / boilerplate text in a
    pre-training corpus. Every ratio is an exact integer half-up
    quotient of exact integer counts (grid rule, _e4 scale), so the
    cross-engine hash cannot drift.

    Per-document metrics need no data movement, so this is a pure map:
    the mode frequency is the longest run in the sorted token array
    (``array_sort`` + a linear ``aggregate`` scan with a struct
    accumulator, O(n log n) per doc), the type count is
    ``array_distinct``. Zero shuffles, zero joins — at 100 TB it runs
    at parquet-scan speed, unlike the naive explode→groupBy→self-join
    shape (measured ~5x slower at sf0.1), and stays linear for
    arbitrarily long documents where a per-row quadratic
    count-each-distinct-token HOF would blow up."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )

    def max_run(sorted_arr):
        """Longest run of equal adjacent elements == mode frequency."""
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )

        def step(acc, x):
            run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.aggregate(sorted_arr, zero, step, lambda acc: acc["best"])

    bigrams = F.expr(
        "transform(slice(toks, 1, size(toks) - 1),"
        " (x, i) -> concat(x, ' ', toks[i + 1]))"
    )
    n_tokens = F.size("toks")
    return d.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        int_ratio(
            F.size(F.array_distinct("toks")), n_tokens, 4
        ).alias("type_token_ratio_e4"),
        int_ratio(
            max_run(F.array_sort("toks")), n_tokens, 4
        ).alias("top_token_frac_e4"),
        int_ratio(
            max_run(F.array_sort(bigrams)), n_tokens - 1, 4
        ).alias("top_bigram_frac_e4"),
    )


_N_CENTROIDS = 4


@register(
    "embedding_centroid_assign",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < {_N_CENTROIDS}),
        scored AS (SELECT e.vec_id, c.c_id,
                          ({_dot("e.v", "c.cv")}) /
                          (sqrt({_dot("e.v", "e.v")}) * sqrt({_dot("c.cv", "c.cv")})) AS sim
                   FROM e CROSS JOIN cent c),
        asg AS (SELECT vec_id, c_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, c_id ASC) AS rn
                FROM scored)
        SELECT c_id, COUNT(*) AS n_assigned,
               CAST(FLOOR(MIN(sim) * 1000000.0 + 0.5) AS BIGINT) AS min_sim_e6,
               CAST(FLOOR(MAX(sim) * 1000000.0 + 0.5) AS BIGINT) AS max_sim_e6,
               CAST((SUM(CAST(FLOOR(sim * 1000000.0 + 0.5) AS BIGINT)) + COUNT(*) // 2)
                    // COUNT(*) AS BIGINT) AS avg_sim_e6
        FROM asg WHERE rn = 1 GROUP BY c_id
    """,
    tags=("similarity", "clustering", "centroid"),
)
def embedding_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step: broadcast 4 deterministic centroids
    (vec_id < 4), cosine-score every vector against each, keep the argmax
    (row_number cut), report per-centroid occupancy and similarity
    envelope. This is the inner loop of IVF index construction and of
    embedding-space clustering; at 100 TB the corpus never shuffles —
    centroids broadcast, assignment is map-side, only the tiny
    per-centroid aggregate moves. Dot products use the same
    left-associated fold as the oracle, so min/max are bit-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
    )
    # bcast-bounded: cents is capped at the constant _N_CENTROIDS by the
    # vec_id < _N_CENTROIDS filter — corpus-size-independent build side
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "c_id", cosine("embedding", "cv").alias("sim")
    )
    # argmax as MAX(struct(sim, -c_id)) — hash aggregate with map-side
    # combine, no sort (see SCALING.md kmeans entry); negating the
    # INTEGER id (not the double) keeps the tie-break at lowest c_id
    # without any -0.0 sign hazard on the re-exposed similarity.
    best = scored.groupBy("vec_id").agg(
        F.max(
            F.struct(F.col("sim").alias("sim"), (-F.col("c_id")).alias("nc"))
        ).alias("b")
    )
    asg = best.select(
        "vec_id", (-F.col("b.nc")).alias("c_id"), F.col("b.sim").alias("sim")
    )
    sim_e6 = F.floor(F.col("sim") * 1000000.0 + F.lit(0.5)).cast("bigint")
    return asg.groupBy("c_id").agg(
        F.count("*").alias("n_assigned"),
        grid(F.min("sim"), 6).alias("min_sim_e6"),
        grid(F.max("sim"), 6).alias("max_sim_e6"),
        int_ratio(F.sum(sim_e6), F.count("*"), 0).alias("avg_sim_e6"),
    )
