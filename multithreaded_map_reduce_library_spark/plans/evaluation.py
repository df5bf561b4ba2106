"""Evaluation-harness queries: the engine measuring its own approximate
operators against their exact counterparts — ANN recall, MinHash estimate
error — plus corpus novelty and trend growth metrics.

A 100 TB pipeline never runs exact kNN or exact all-pairs Jaccard in
production; it runs the approximate operator and needs a *measured*
quality bound from a sample. These queries are that measurement, kept
fully deterministic (hash-derived sketches, integer counts, IEEE-exact
ratios) so they hash-match a DuckDB oracle.

Reference parity note: none of these exist in the reference (its whole
surface is the five functions in ``mapreduce.h:44-83``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.operators import dedup as D
from multithreaded_map_reduce_library_spark.functions.grid import (
    grid,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table, scaled_broadcast

_K = 3
_NQ = 10
_DIM = 64
_PLANES = 8


def _recall_oracle() -> str:
    from multithreaded_map_reduce_library_spark.plans.similarity_q import (
        _bucket_sql,
        _dot,
    )

    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {_NQ}),
        xs AS (SELECT q_id, vec_id AS n_id,
                      ({_dot("qv", "v")}) / (sqrt({_dot("qv", "qv")}) * sqrt({_dot("v", "v")})) AS sim
               FROM q JOIN e ON vec_id <> q_id),
        ex AS (SELECT q_id, n_id FROM (
                   SELECT q_id, n_id,
                          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
                   FROM xs) WHERE rk <= {_K}),
        b AS (SELECT vec_id, v, {_bucket_sql("v")} AS bucket FROM e),
        ls AS (SELECT a.vec_id AS q_id, x.vec_id AS n_id,
                      ({_dot("a.v", "x.v")}) / (sqrt({_dot("a.v", "a.v")}) * sqrt({_dot("x.v", "x.v")})) AS sim
               FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id
               WHERE a.vec_id < {_NQ}),
        ann AS (SELECT q_id, n_id FROM (
                    SELECT q_id, n_id,
                           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
                    FROM ls) WHERE rk <= {_K}),
        hit AS (SELECT ex.q_id, COUNT(ann.n_id) AS n_matched
                FROM ex LEFT JOIN ann ON ann.q_id = ex.q_id AND ann.n_id = ex.n_id
                GROUP BY ex.q_id)
        SELECT q_id, n_matched,
               CAST((n_matched * 1000000 + {_K} // 2) // {_K} AS BIGINT) AS recall_e6
        FROM hit
    """


@register(
    "ann_recall_vs_exact",
    oracle=_recall_oracle(),
    tags=("evaluation", "similarity", "ann", "recall"),
)
def ann_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the LSH ANN (``ann_lsh_cosine``'s 8-plane index)
    against exact brute-force kNN for the 10-vector query set — the
    quality measurement that justifies running the approximate index at
    scale. n_matched/3 is an exact binary rational, so the score
    hash-matches DuckDB.

    Scale design: exact kNN runs only over the small query sample
    (broadcast queries x corpus, no shuffle of the corpus); the ANN side
    reuses the production bucket join. The expensive exact pass is
    bounded by the sample size — exactly how recall is audited at
    100 TB."""
    from multithreaded_map_reduce_library_spark.operators.similarity import (
        knn_bruteforce,
        knn_lsh,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < _NQ)
    exact = knn_bruteforce(emb, query_ids=qset, k=_K).select("q_id", "n_id")
    ann = (
        knn_lsh(emb, dim=_DIM, k=_K, num_planes=_PLANES)
        .filter(F.col("q_id") < _NQ)
        .select(F.col("q_id").alias("a_q"), F.col("n_id").alias("a_n"))
    )
    hit = (
        exact.join(
            ann,
            (F.col("q_id") == F.col("a_q")) & (F.col("n_id") == F.col("a_n")),
            "left",
        )
        .groupBy("q_id")
        .agg(F.count("a_n").alias("n_matched"))
    )
    return hit.select(
        "q_id",
        "n_matched",
        int_ratio(F.col("n_matched"), F.lit(_K), 6).alias("recall_e6"),
    )


def _mh_est_oracle() -> str:
    from multithreaded_map_reduce_library_spark.plans.pipeline import (
        _duck_band_exprs,
        _duck_minhash_sig_cte,
    )

    eq_terms = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(16)
    )
    return f"""
        WITH {_duck_minhash_sig_cte()},
        bands AS (SELECT doc_id, unnest({_duck_band_exprs()}) AS band_key FROM sig),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        d AS (SELECT doc_id, unnest(list_distinct(hv)) AS shingle FROM hs),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
        inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS i
                  FROM cand c
                  JOIN d da ON da.doc_id = c.id_a
                  JOIN d db ON db.doc_id = c.id_b AND db.shingle = da.shingle
                  GROUP BY 1, 2),
        x AS (SELECT cand.id_a, cand.id_b,
                     CAST(({eq_terms}) AS DOUBLE) / CAST(16 AS DOUBLE) AS est,
                     CAST(COALESCE(i, 0) AS DOUBLE)
                         / (za.n + zb.n - COALESCE(i, 0)) AS exact_j
              FROM cand
              JOIN sig sa ON sa.doc_id = cand.id_a
              JOIN sig sb ON sb.doc_id = cand.id_b
              JOIN sizes za ON za.doc_id = cand.id_a
              JOIN sizes zb ON zb.doc_id = cand.id_b
              LEFT JOIN inter ON inter.id_a = cand.id_a AND inter.id_b = cand.id_b
        )
        SELECT id_a, id_b, est,
               CAST(FLOOR(exact_j * 1000000.0 + 0.5) AS BIGINT) AS exact_j_e6,
               CAST(FLOOR(ABS(est - exact_j) * 1000000.0 + 0.5) AS BIGINT) AS err_e6
        FROM x
    """


@register(
    "minhash_estimate_error",
    oracle=_mh_est_oracle(),
    tags=("evaluation", "dedup", "minhash"),
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-pair MinHash quality audit: the k=16 signature's
    Jaccard estimate (matching components / 16) against the exact
    shingle Jaccard, with the absolute error — the measurement that
    sizes k before trusting the sketch on the full corpus. est is an
    exact binary rational (16ths) and exact_j a single IEEE division, so
    both engines agree bitwise.

    Scale design: signatures and candidate pairs come from the
    production MinHash-LSH path (map-side sketch, band-key shuffle); the
    exact-Jaccard verification join is restricted to candidates — this
    audit costs the same as ``minhash_lsh_candidates``, not all-pairs."""
    from multithreaded_map_reduce_library_spark.functions.text import (
        tokens,
        word_shingle_hash32,
    )
    from multithreaded_map_reduce_library_spark.plans.pipeline import (
        _shingle_hash_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    with_h = docs.select(
        "doc_id", word_shingle_hash32(tokens("text"), 3).alias("_h")
    )
    sigs = with_h.select(
        "doc_id", D.minhash_signature(F.col("_h"), 16).alias("sig")
    )
    cand = D.minhash_lsh_pairs(docs, num_hashes=16, bands=4, shingle_n=3)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    sh = _shingle_hash_index(docs)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n"))
    da = sh.select(F.col("doc").alias("id_a"), "shingle")
    db = sh.select(F.col("doc").alias("id_b"), "shingle")
    inter = (
        # cand is a candidate-PAIR set (LSH band self-join expansion):
        # its cardinality is not bounded by any single table's size —
        # duplicate-heavy corpora can push it toward n^2/2 — so no
        # forced hint at all (code-review r8); AQE broadcasts it at
        # runtime when it is actually small.
        cand
        .join(da, "id_a")
        .join(db, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    za = sizes.select(F.col("doc").alias("id_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc").alias("id_b"), F.col("n").alias("nb"))
    eq = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = eq.cast("double") / F.lit(16.0)
    out = (
        cand.join(scaled_broadcast(sa, sf_dir, "documents"), "id_a")
        .join(scaled_broadcast(sb, sf_dir, "documents"), "id_b")
        .join(scaled_broadcast(za, sf_dir, "documents"), "id_a")
        .join(scaled_broadcast(zb, sf_dir, "documents"), "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .withColumn("i0", F.coalesce("i", F.lit(0)))
    )
    exact_j = F.col("i0").cast("double") / (
        F.col("na") + F.col("nb") - F.col("i0")
    )
    return out.select(
        "id_a",
        "id_b",
        est.alias("est"),
        grid(exact_j, 6).alias("exact_j_e6"),
        grid(F.abs(est - exact_j), 6).alias("err_e6"),
    )


def _novelty_oracle() -> str:
    from multithreaded_map_reduce_library_spark.plans.pipeline import (
        _duck_h32,
        _duck_shingles,
    )

    return f"""
        WITH sh AS (SELECT doc_id, {_duck_shingles(3)} AS s FROM documents),
        hs AS (SELECT doc_id, list_transform(s, x -> {_duck_h32("x")}) AS hv FROM sh),
        d AS (SELECT doc_id, unnest(list_distinct(hv)) AS shingle FROM hs),
        first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM d GROUP BY shingle)
        SELECT doc_id, n_shingles, n_novel,
               CAST((n_novel * 1000000 + n_shingles // 2) // n_shingles AS BIGINT)
                   AS novelty_e6
        FROM (SELECT d.doc_id, COUNT(*) AS n_shingles,
                     CAST(SUM(CASE WHEN first.first_doc = d.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
              FROM d JOIN first USING (shingle)
              GROUP BY d.doc_id)
    """


@register(
    "doc_ngram_novelty",
    oracle=_novelty_oracle(),
    tags=("evaluation", "dedup", "text-analysis", "documents"),
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus novelty: per document, the fraction of its
    distinct 3-gram shingles whose FIRST appearance (lowest doc_id) is
    this document — ~1.0 for fresh content, ~0.0 for rehashes of earlier
    documents. The streaming-ingest cousin of pairwise dedup: one global
    first-seen table instead of a quadratic pair space.

    Scale design: the shingle index shuffles once on the 8-byte shingle
    hash to find first owners (partial MIN combines map-side), then
    joins back to the same-keyed index — AQE reuses the partitioning.
    The first-seen table persists as state in production, making
    novelty an incremental per-batch score.

    The displayed ratio is an exact integer half-up quotient (_e6
    grid, functions/grid.py) in BOTH the plan and the oracle, so the
    driver's value hash is byte-stable regardless of its float
    normalization — the round-1 ROUND(double) form of this query burned
    a driver row; its coverage twin burned again in round 2 before the
    grid sweep."""
    from multithreaded_map_reduce_library_spark.plans.pipeline import (
        _shingle_hash_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_hash_index(docs)
    first = sh.groupBy("shingle").agg(F.min("doc").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc"), 1).otherwise(0)
    )
    return (
        sh.join(first, "shingle")
        .groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.count("*").alias("n_shingles"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            int_ratio(F.col("n_novel"), F.col("n_shingles"), 6).alias("novelty_e6"),
        )
    )


@register(
    "events_weekly_growth",
    oracle="""
        WITH w AS (
            SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
                   SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS s_e4
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, week,
               CAST(s_e4 AS DOUBLE) / CAST(10000 AS DOUBLE) AS sum_value,
               CAST(FLOOR((CAST(s_e4 AS DOUBLE)
                - CAST(lag(s_e4) OVER (PARTITION BY event_type ORDER BY week) AS DOUBLE))
               / CAST(lag(s_e4) OVER (PARTITION BY event_type ORDER BY week) AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT) AS wow_growth_e6
        FROM w
    """,
    tags=("timeseries", "growth", "window", "events"),
)
def events_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth rate of event value per event type — the
    trend metric every ops dashboard leads with. Weekly sums are exact
    integer ten-thousandths; the growth ratio is arithmetic on those
    exact integers (NULL for each type's first week).

    Scale design: the fact scan collapses in one partial-agg shuffle to
    |types x weeks| rows; the lag window runs on that tiny grid."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        e.select(
            "event_type",
            F.date_trunc("week", "ts").cast("date").alias("week"),
            F.floor(F.col("value") * 10000).cast("long").alias("q"),
        )
        .groupBy("event_type", "week")
        .agg(F.sum("q").alias("s_e4"))
    )
    lag = F.lag("s_e4").over(Window.partitionBy("event_type").orderBy("week"))
    return w.select(
        "event_type",
        "week",
        (F.col("s_e4").cast("double") / F.lit(10000.0)).alias("sum_value"),
        grid(
            (F.col("s_e4").cast("double") - lag.cast("double")) / lag.cast("double"), 6
        ).alias("wow_growth_e6"),
    )


@register(
    "embedding_quantile_normalize",
    oracle="""
        WITH x AS (SELECT vec_id, CAST(i AS BIGINT) AS dim,
                          CAST(embedding[i + 1] AS DOUBLE) AS v
                   FROM embeddings, generate_series(0, 63) AS g(i)),
        n AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
        r AS (SELECT vec_id, dim,
                     CAST(RANK() OVER (PARTITION BY dim ORDER BY v) AS BIGINT) - 1
                         AS rk0
              FROM x)
        SELECT vec_id,
               CAST((CAST(SUM(rk0) AS BIGINT) * 1000000 + (64 * (n_vecs - 1)) // 2)
                    // (64 * (n_vecs - 1)) AS BIGINT) AS mean_qnorm_e6,
               MIN(rk0) AS min_rank0, MAX(rk0) AS max_rank0
        FROM r CROSS JOIN n
        GROUP BY vec_id, n_vecs
    """,
    tags=("embeddings", "normalization", "rank", "window"),
)
def embedding_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization of the embedding matrix: each
    value becomes its percent-rank within its dimension ((rank-1)/(n-1)),
    summarized per vector as the mean normalized coordinate plus the
    rank envelope — the distribution-free rescaling that makes
    dimensions comparable regardless of their marginal shapes (the
    rank-transform cousin of ``embedding_dimension_stats`` whitening).
    Ranks are integers and the mean divides integer sums once, so the
    result is engine-exact (ties share a rank by value equality — no
    tiebreak needed).

    Scale design: posexplode is a pure map; each of the 64 dimension
    partitions sorts independently (64-way parallel global ranks —
    partitionBy dim bounds every sort at |corpus| rows, far under the
    all-dims matrix). At 100 TB the exact rank swaps for
    approx-percentile bin edges; the per-vector rollup is one groupBy on
    vec_id."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "vf")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )
    n = emb.agg(F.count("*").alias("n_vecs"))
    rk0 = (
        F.rank().over(Window.partitionBy("dim").orderBy("v")).cast("long") - 1
    )
    r = x.select("vec_id", rk0.alias("rk0"))
    return (
        r.crossJoin(F.broadcast(n))
        .groupBy("vec_id", "n_vecs")
        .agg(
            int_ratio(
                F.sum("rk0"), F.lit(64) * (F.col("n_vecs") - 1), 6
            ).alias("mean_qnorm_e6"),
            F.min("rk0").alias("min_rank0"),
            F.max("rk0").alias("max_rank0"),
        )
        .select("vec_id", "mean_qnorm_e6", "min_rank0", "max_rank0")
    )


@register(
    "token_zipf_table",
    oracle="""
        WITH tok AS (SELECT unnest(string_split_regex(text, '[ \t\r\n]')) AS w
                     FROM documents),
        c AS (SELECT w, COUNT(*) AS freq FROM tok WHERE w <> '' GROUP BY w),
        r AS (SELECT w, freq,
                     CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w) AS BIGINT) AS rank
              FROM c)
        SELECT rank, w AS token, freq, rank * freq AS zipf_product
        FROM r
    """,
    tags=("text-analysis", "zipf", "corpus-stats"),
)
def token_zipf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency table of the corpus vocabulary: tokens ranked
    by frequency with the rank x frequency product — under Zipf's law the
    product is roughly constant, and its drift across ranks is the
    standard natural-language sanity check on a training corpus (a flat
    product curve on synthetic data is itself a finding). Integer-only
    (the log-log regression variant needs libm; the product ranks
    identically), deterministic tiebreak on token.

    Scale design: the vocabulary aggregate is the only wide shuffle; the
    global rank over the vocabulary (not the corpus) is dimension-scale.
    At 100 TB vocabularies still fit one partition after aggregation —
    and if not, rank over (freq band, token) ranges first."""
    from multithreaded_map_reduce_library_spark.functions.text import tokens
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("w"))
    return c.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("w").alias("token"),
        "freq",
    ).withColumn("zipf_product", F.col("rank") * F.col("freq"))


@register(
    "rolling_24h_distinct_users",
    oracle="""
        WITH e AS (SELECT user_id,
                          CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h
                   FROM events),
        expanded AS (SELECT DISTINCT user_id, unnest(generate_series(h, h + 23)) AS wh
                     FROM e),
        bounds AS (SELECT MIN(h) AS hmin, MAX(h) AS hmax FROM e)
        SELECT wh AS window_end_hour, COUNT(*) AS n_distinct_users
        FROM expanded, bounds
        WHERE wh >= hmin + 23 AND wh <= hmax
        GROUP BY wh
    """,
    tags=("timeseries", "sliding-window", "distinct", "events"),
)
def rolling_24h_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour distinct users, evaluated every hour — the DAU-
    style engagement metric that is notoriously expensive because COUNT
    DISTINCT does not decompose over sliding windows. Expressed exactly:
    each (user, active hour) pair expands to the 24 hourly windows it
    falls in, then one distinct count per window; edge windows without a
    full 24 h of history are excluded.

    Scale design: the expansion is a generated sequence (x24, map-side)
    over the DEDUPED (user, hour) activity table — far smaller than raw
    events — and the per-window distinct is one partial-agg shuffle on
    the window hour. The approximate twin at 100 TB is
    ``hll_distinct_users_daily`` (mergeable sketches); this exact form is
    the auditing oracle for it."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600
        ).cast("long").alias("h"),
    )
    active = e.distinct()
    expanded = active.select(
        "user_id", F.explode(F.sequence("h", F.col("h") + 23)).alias("wh")
    ).distinct()
    bounds = e.agg(F.min("h").alias("hmin"), F.max("h").alias("hmax"))
    return (
        expanded.crossJoin(F.broadcast(bounds))
        .filter((F.col("wh") >= F.col("hmin") + 23) & (F.col("wh") <= F.col("hmax")))
        .groupBy(F.col("wh").alias("window_end_hour"))
        .agg(F.count("*").alias("n_distinct_users"))
    )


def _keep_best_oracle() -> str:
    from multithreaded_map_reduce_library_spark.plans.pipeline import (
        _duck_band_exprs,
        _duck_minhash_sig_cte,
        _duck_quality_sql,
    )

    return f"""
        WITH RECURSIVE {_duck_minhash_sig_cte().strip()},
        bands AS (SELECT doc_id, unnest({_duck_band_exprs()}) AS band_key FROM sig),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        e AS (SELECT id_a AS u, id_b AS v FROM cand
              UNION ALL SELECT id_b, id_a FROM cand),
        reach(u, w) AS (
            SELECT DISTINCT u, u FROM e
            UNION
            SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.w
        ),
        comp AS (SELECT u AS doc, MIN(w) AS cluster FROM reach GROUP BY u),
        q AS ({_duck_quality_sql()}),
        allq AS (SELECT d.doc_id,
                        COALESCE(comp.cluster, d.doc_id) AS cluster,
                        q.quality_e4
                 FROM documents d
                 LEFT JOIN comp ON comp.doc = d.doc_id
                 JOIN q ON q.doc_id = d.doc_id),
        r AS (SELECT doc_id, cluster, quality_e4,
                     ROW_NUMBER() OVER (PARTITION BY cluster
                                        ORDER BY quality_e4 DESC, doc_id) AS rk
              FROM allq)
        SELECT doc_id, cluster, quality_e4, rk = 1 AS keep FROM r
    """


@register(
    "dedup_keep_best_quality",
    oracle=_keep_best_oracle(),
    tags=("dedup", "quality", "clustering", "decision"),
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION list — the operator a corpus build actually
    ships: every document labeled with its near-dup cluster (LSH
    candidate graph -> connected components; edge-free documents are
    their own singleton cluster) and a keep flag marking the
    highest-QUALITY member per cluster (quality-argmax, tie to lowest
    doc_id) rather than the naive min-id keeper. Composes three
    production operators (minhash_lsh_candidates, dedup_clusters,
    doc_quality_score) into one auditable output.

    Scale design: clustering cost is the LSH band shuffle + a
    diameter-bounded label-propagation loop (near-dup graphs are
    shallow); the quality join is map-side per doc; the keep flag is one
    per-cluster window with O(1) state via WindowGroupLimit. Nothing
    touches the quadratic pair space."""
    from multithreaded_map_reduce_library_spark.operators import dedup as D
    from multithreaded_map_reduce_library_spark.operators import textstats as T
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    cand = D.minhash_lsh_pairs(docs, num_hashes=16, bands=4, shingle_n=3)
    comp = D.connected_components(cand)
    q = docs.select(
        "doc_id", grid(T.quality_score("text"), 4).alias("quality_e4")
    )
    allq = (
        q.join(comp, q.doc_id == comp.doc, "left")
        .select(
            "doc_id",
            F.coalesce("cluster", "doc_id").alias("cluster"),
            "quality_e4",
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("cluster").orderBy(F.col("quality_e4").desc(), "doc_id")
    )
    return allq.select(
        "doc_id", "cluster", "quality_e4", (rk == 1).alias("keep")
    )


def _recall_cmp_oracle() -> str:
    from multithreaded_map_reduce_library_spark.plans.similarity_q import (
        _IVF_MAX_CENT,
        _IVF_STRIDE,
        _bucket_sql,
        _dot,
        _probe_sql,
    )

    cos = lambda a, b: (  # noqa: E731
        f"({_dot(a, b)}) / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}))"
    )
    denom = _NQ * _K
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {_NQ}),
        xs AS (SELECT q_id, vec_id AS n_id, {cos("qv", "v")} AS sim
               FROM q JOIN e ON vec_id <> q_id),
        ex AS (SELECT q_id, n_id FROM (
                   SELECT q_id, n_id,
                          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
                   FROM xs) WHERE rk <= {_K}),
        b AS (SELECT vec_id, v, {_bucket_sql("v")} AS bucket FROM e),
        ls1 AS (SELECT a.vec_id AS q_id, x.vec_id AS n_id, {cos("a.v", "x.v")} AS sim
                FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id
                WHERE a.vec_id < {_NQ}),
        ann_lsh AS (SELECT q_id, n_id FROM (
                    SELECT q_id, n_id,
                           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
                    FROM ls1) WHERE rk <= {_K}),
        qp AS (SELECT vec_id AS q_id, v AS qv,
                      unnest({_probe_sql("bucket", _PLANES)}) AS bucket
               FROM b WHERE vec_id < {_NQ}),
        ls2 AS (SELECT qp.q_id, x.vec_id AS n_id, {cos("qp.qv", "x.v")} AS sim
                FROM qp JOIN b x ON qp.bucket = x.bucket AND qp.q_id <> x.vec_id),
        ann_mp AS (SELECT q_id, n_id FROM (
                   SELECT q_id, n_id,
                          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
                   FROM ls2) WHERE rk <= {_K}),
        cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id % {_IVF_STRIDE} = 0
                ORDER BY vec_id LIMIT {_IVF_MAX_CENT}),
        scored AS (SELECT e.vec_id, e.v, c.c_id, {cos("e.v", "c.cv")} AS csim
                   FROM e CROSS JOIN cent c),
        asg AS (SELECT vec_id, v, c_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id ASC) AS rn
                FROM scored),
        cells AS (SELECT vec_id, v, c_id AS cell FROM asg WHERE rn = 1),
        p1 AS (SELECT vec_id AS q_id, v AS qv, c_id AS cell FROM asg
               WHERE rn = 1 AND vec_id < {_NQ}),
        s1 AS (SELECT p1.q_id, c.vec_id AS n_id, {cos("p1.qv", "c.v")} AS sim
               FROM p1 JOIN cells c ON p1.cell = c.cell AND c.vec_id <> p1.q_id),
        ann_ivf1 AS (SELECT q_id, n_id FROM (
                     SELECT q_id, n_id,
                            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
                     FROM s1) WHERE rk <= {_K}),
        p2 AS (SELECT vec_id AS q_id, v AS qv, c_id AS cell FROM asg
               WHERE rn <= 2 AND vec_id < {_NQ}),
        s2 AS (SELECT p2.q_id, c.vec_id AS n_id, {cos("p2.qv", "c.v")} AS sim
               FROM p2 JOIN cells c ON p2.cell = c.cell AND c.vec_id <> p2.q_id),
        ann_ivf2 AS (SELECT q_id, n_id FROM (
                     SELECT q_id, n_id,
                            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
                     FROM s2) WHERE rk <= {_K})
        SELECT 'lsh_p8' AS method, COUNT(*) AS n_hits,
               CAST((COUNT(*) * 1000000 + {denom} // 2) // {denom} AS BIGINT) AS recall_e6
        FROM ex JOIN ann_lsh USING (q_id, n_id)
        UNION ALL
        SELECT 'lsh_multiprobe', COUNT(*),
               CAST((COUNT(*) * 1000000 + {denom} // 2) // {denom} AS BIGINT)
        FROM ex JOIN ann_mp USING (q_id, n_id)
        UNION ALL
        SELECT 'ivf_nprobe1', COUNT(*),
               CAST((COUNT(*) * 1000000 + {denom} // 2) // {denom} AS BIGINT)
        FROM ex JOIN ann_ivf1 USING (q_id, n_id)
        UNION ALL
        SELECT 'ivf_nprobe2', COUNT(*),
               CAST((COUNT(*) * 1000000 + {denom} // 2) // {denom} AS BIGINT)
        FROM ex JOIN ann_ivf2 USING (q_id, n_id)
    """


@register(
    "ann_recall_comparison",
    oracle=_recall_cmp_oracle(),
    tags=("evaluation", "similarity", "ann", "recall", "multiprobe", "ivf"),
)
def ann_recall_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of all four ANN variants against exact brute force in ONE
    table — the index-selection evidence a production deployment needs:
    single-probe LSH vs multi-probe LSH (recall recovered by probing
    Hamming-1 buckets) and IVF nprobe=1 vs nprobe=2 (recall recovered by
    probing the second-nearest cell). Each method's candidate generation
    is the registered production operator, not a reimplementation.

    Scale design: the exact pass is bounded by the query sample; every
    approximate pass reuses its production plan shape (bucket equi-joins,
    broadcast query fan-out); the four one-row aggregates union at the
    end."""
    from multithreaded_map_reduce_library_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
        knn_ivf_multiprobe,
        knn_lsh,
        knn_lsh_multiprobe,
    )
    from multithreaded_map_reduce_library_spark.plans.similarity_q import (
        _IVF_MAX_CENT,
        _IVF_STRIDE,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < _NQ)
    exact = knn_bruteforce(emb, query_ids=qset, k=_K).select("q_id", "n_id")
    methods = {
        "lsh_p8": knn_lsh(emb, dim=_DIM, k=_K, num_planes=_PLANES).filter(
            F.col("q_id") < _NQ
        ),
        "lsh_multiprobe": knn_lsh_multiprobe(
            emb, dim=_DIM, k=_K, num_planes=_PLANES, num_queries=_NQ
        ),
        "ivf_nprobe1": knn_ivf(
            emb,
            stride=_IVF_STRIDE,
            k=_K,
            num_queries=_NQ,
            max_centroids=_IVF_MAX_CENT,
        ),
        "ivf_nprobe2": knn_ivf_multiprobe(
            emb,
            stride=_IVF_STRIDE,
            k=_K,
            nprobe=2,
            num_queries=_NQ,
            max_centroids=_IVF_MAX_CENT,
        ),
    }
    denom = _NQ * _K
    parts = []
    for name, ann in methods.items():
        hits = exact.join(ann.select("q_id", "n_id"), ["q_id", "n_id"])
        parts.append(
            hits.agg(F.count("*").alias("n_hits")).select(
                F.lit(name).alias("method"),
                "n_hits",
                int_ratio(F.col("n_hits"), F.lit(denom), 6).alias("recall_e6"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
