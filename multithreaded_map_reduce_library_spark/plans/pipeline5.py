"""Pipeline batch 5: incremental-maintenance and feature-statistics
primitives — merge-based incremental aggregation (the MERGE/upsert
pattern), per-dimension embedding statistics, collocation lift, and a
pure-SQL-API query.

Reference parity note: none of these exist in the reference (its whole
surface is the five functions in ``mapreduce.h:44-83``). Float rules
follow SCALING.md's exact-quantization rule: sums are over per-row
integer ten-thousandths, quotients of exact integers are rounded once,
and remaining double arithmetic is +,-,*,/ only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


def _e4(c):
    return F.floor(c * 10000).cast("long")


@register(
    "incremental_agg_merge_daily",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               SUM(CAST(FLOOR(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
        FROM events
        GROUP BY user_id
    """,
    tags=("incremental", "merge", "upsert", "events"),
)
def incremental_agg_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: per-user totals are
    built as STATE (all days before the latest) merged with a DELTA
    (the latest day only) via full-outer join + coalesce — the
    MERGE/upsert shape every warehouse uses to avoid recomputing a
    100 TB aggregate when one day of data arrives. The oracle is the
    full recompute: merge-maintenance must be indistinguishable from
    it, which the exact integer partials guarantee (int sums fold
    associatively, so state+delta == total bit-for-bit).

    Scale design: both branches aggregate before the join, so the merge
    joins |users| rows against |active-today users| rows — never raw
    events. In production the state side is the previously-written
    aggregate table (one partition read), the delta side is today's
    partition; the latest-day scalar here is a one-row broadcast, not a
    driver collect.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    last = e.agg(F.max("day").alias("last_day"))
    e2 = e.crossJoin(F.broadcast(last))

    def daily(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum(_e4(F.col("value"))).alias("s")
        )

    state = daily(e2.filter(F.col("day") < F.col("last_day")))
    delta = daily(e2.filter(F.col("day") == F.col("last_day")))
    merged = state.withColumnsRenamed({"n": "n_old", "s": "s_old"}).join(
        delta.withColumnsRenamed({"n": "n_new", "s": "s_new"}), "user_id", "full_outer"
    )
    zero = F.lit(0).cast("long")
    return merged.select(
        "user_id",
        (F.coalesce("n_old", zero) + F.coalesce("n_new", zero)).alias("n_events"),
        (
            (F.coalesce("s_old", zero) + F.coalesce("s_new", zero)) / F.lit(10000.0)
        ).alias("sum_value"),
    )


@register(
    "embedding_dimension_stats",
    oracle="""
        WITH x AS (SELECT CAST(i AS BIGINT) AS dim,
                          CAST(embedding[i + 1] AS DOUBLE) AS v
                   FROM embeddings, generate_series(0, 63) AS g(i)),
        q AS (SELECT dim, v, CAST(FLOOR(v * 10000) AS BIGINT) AS qv FROM x)
        SELECT dim,
               COUNT(*) AS n,
               CAST(FLOOR(CAST(CAST(SUM(qv) AS BIGINT) AS DOUBLE)
                     / (CAST(10000 AS DOUBLE) * COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS mean_e6,
               CAST(FLOOR((CAST(CAST(SUM(qv * qv) AS BIGINT) AS DOUBLE)
                      - CAST(CAST(SUM(qv) AS BIGINT) AS DOUBLE) * CAST(SUM(qv) AS BIGINT) / COUNT(*))
                     / (COUNT(*) * CAST(100000000 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS var_e6,
               CAST(FLOOR(MIN(v) * 1000000.0 + 0.5) AS BIGINT) AS min_v_e6,
               CAST(FLOOR(MAX(v) * 1000000.0 + 0.5) AS BIGINT) AS max_v_e6
        FROM q GROUP BY dim
    """,
    tags=("embeddings", "feature-stats", "vectors"),
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics of the embedding matrix (count, mean,
    population variance, min, max for each of the 64 dimensions) — the
    feature-scaling / whitening pre-pass of any vector pipeline, and a
    drift monitor in production. Mean and variance come from exact
    integer sums of quantized values (sum and sum-of-squares), so the
    cross-engine hash cannot drift with partition order.

    Scale design: posexplode is a pure map; the single shuffle carries
    64 x tasks partial-aggregate rows regardless of corpus size
    (partial HashAggregate combines map-side). min/max of raw floats
    are order-independent by definition.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode("embedding").alias("dim", "vf")
    ).select(F.col("dim").cast("long").alias("dim"), F.col("vf").cast("double").alias("v"))
    q = x.withColumn("qv", _e4(F.col("v")))
    n = F.count("*")
    s = F.sum("qv")
    sq = F.sum(F.col("qv") * F.col("qv"))
    return q.groupBy("dim").agg(
        n.alias("n"),
        grid(s.cast("double") / (F.lit(10000.0) * n), 6).alias("mean_e6"),
        grid(
            (sq.cast("double") - s.cast("double") * s / n)
            / (n * F.lit(100000000.0)),
            6,
        ).alias("var_e6"),
        grid(F.min("v"), 6).alias("min_v_e6"),
        grid(F.max("v"), 6).alias("max_v_e6"),
    )


@register(
    "bigram_lift_assoc",
    oracle="""
        WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        tok AS (SELECT unnest(toks) AS w FROM t),
        uni AS (SELECT w, COUNT(*) AS nw FROM tok GROUP BY w),
        ntok AS (SELECT COUNT(*) AS n_tok FROM tok),
        bg AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                            i -> [toks[i], toks[i + 1]])) AS p
               FROM t),
        bgc AS (SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS n_ab
                FROM bg GROUP BY p[1], p[2]),
        nbg AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_bg FROM bgc)
        SELECT w1, w2, n_ab,
               CAST(FLOOR((CAST(n_ab AS DOUBLE) * n_tok * n_tok)
                     / (CAST(n_bg AS DOUBLE) * a.nw * b.nw) * 10000.0 + 0.5) AS BIGINT) AS lift_e4
        FROM bgc
        JOIN uni a ON a.w = w1
        JOIN uni b ON b.w = w2
        CROSS JOIN ntok CROSS JOIN nbg
        WHERE n_ab >= 5
    """,
    tags=("text-analysis", "collocation", "lift", "documents"),
)
def bigram_lift_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by lift: for every adjacent token pair seen
    >= 5 times, ``P(ab) / (P(a) * P(b))`` — how much more often the
    pair occurs than independence predicts (PMI without the log, so
    the score stays inside IEEE *,/ and hash-checks exactly; ranking
    is order-equivalent to PMI).

    Scale design: unigram and bigram counts are two partial-agg
    shuffles over narrow keys; the unigram table (vocabulary-sized)
    broadcasts back onto the bigram counts twice, and the two global
    scalars are one-row broadcasts. Nothing rescans the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.split("text", " ").alias("toks"))
    tok = t.select(F.explode("toks").alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("nw"))
    ntok = tok.agg(F.count("*").alias("n_tok"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.array(F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    bg = t.filter(F.size("toks") >= 2).select(F.explode(pairs).alias("p"))
    bgc = bg.groupBy(
        F.element_at("p", 1).alias("w1"), F.element_at("p", 2).alias("w2")
    ).agg(F.count("*").alias("n_ab"))
    nbg = bgc.agg(F.sum("n_ab").alias("n_bg"))
    a = uni.withColumnsRenamed({"w": "w1", "nw": "nw_a"})
    b = uni.withColumnsRenamed({"w": "w2", "nw": "nw_b"})
    return (
        bgc.filter(F.col("n_ab") >= 5)
        .join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(ntok))
        .crossJoin(F.broadcast(nbg))
        .select(
            "w1",
            "w2",
            "n_ab",
            grid(
                (F.col("n_ab").cast("double") * F.col("n_tok") * F.col("n_tok"))
                / (F.col("n_bg").cast("double") * F.col("nw_a") * F.col("nw_b")),
                4,
            ).alias("lift_e4"),
        )
    )


_TOP_PARTS_SQL = """
    WITH rev AS (
        SELECT p_brand, l_partkey,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) AS rev_e4
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, l_partkey
    ),
    ranked AS (
        SELECT p_brand, l_partkey, rev_e4,
               CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                       ORDER BY rev_e4 DESC, l_partkey)
                    AS BIGINT) AS rk
        FROM rev
    )
    SELECT p_brand, l_partkey,
           CAST(rev_e4 AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS revenue, rk
    FROM ranked WHERE rk <= 3
"""


@register(
    "sql_cte_top_parts_per_brand",
    oracle=_TOP_PARTS_SQL,
    tags=("sql-api", "cte", "window", "topk"),
)
def sql_cte_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts per brand, authored END-TO-END in the SQL
    API: the exact ANSI text the DuckDB oracle runs is handed to
    ``spark.sql`` over temp views — demonstrating that the engine's SQL
    surface (CTEs, joins, windows, integer-quantized money math) is
    the same language Catalyst compiles as the DataFrame API. One
    source string, two engines, one hash.

    Scale design: identical to the DataFrame plans — the part join
    broadcasts, the rank filter benefits from WindowGroupLimit pushdown
    (per-partition top-k before the window shuffle completes), and the
    deterministic (rev, partkey) tiebreak keeps ranks engine-stable.
    """
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TOP_PARTS_SQL)
