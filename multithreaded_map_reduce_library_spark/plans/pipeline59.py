"""Pipeline batch 59: the order-invariant corpus content signature
(dataset-versioning manifest row) and week-over-week total-variation
drift of the event-type mix (the third drift lens beside KS on values
and chi-squared on the full table: TV is the one with the "fraction of
traffic that changed type" reading).

Both exact-integer: the signature sums 48-bit content hashes mod 2^48
(commutative — partition order can never change it); TV distances are
max |c1*n2 - c2*n1| cross-multiplications divided once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_POW48 = 1 << 48


@register(
    "corpus_content_signature",
    oracle=f"""
        SELECT COUNT(*) AS n_docs,
               SUM(octet_length(encode(text))) AS n_bytes,
               SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),
                                        1, 12)) AS BIGINT)) % {_POW48}
                   AS content_sig
        FROM documents
    """,
    tags=("data-quality", "signature", "versioning", "documents"),
)
def corpus_content_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant corpus content signature: row count, byte total,
    and the SUM of per-document 48-bit content hashes mod 2^48 — a
    dataset manifest row that is identical no matter how the corpus is
    partitioned, ordered, or re-shuffled (sum is commutative), and that
    changes if ANY document's id or text changes. The integrity check a
    data catalog records per dataset version; two engines producing the
    same signature have byte-identical corpora.

    Scale design: one map-side hash per row + a 3-value aggregate with
    map-side combine. The cheapest possible whole-corpus invariant.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(F.encode("text", "utf-8"))).alias("n_bytes"),
        (F.sum(h) % _POW48).alias("content_sig"),
    )


@register(
    "weekly_type_mix_tv_drift",
    oracle="""
        WITH w AS (
            SELECT CAST(FLOOR((CAST(ts AS DATE) - DATE '2024-01-01') / 7) AS BIGINT)
                       AS week,
                   event_type, COUNT(*) AS c
            FROM events GROUP BY week, event_type
        ),
        n AS (SELECT week, SUM(c) AS n FROM w GROUP BY week),
        p AS (
            SELECT a.week AS week_a, b.week AS week_b,
                   a.event_type,
                   ABS(a.c * nb.n - b.c * na.n) AS num,
                   na.n AS n_a, nb.n AS n_b
            FROM w a
            JOIN w b ON b.week = a.week + 1 AND b.event_type = a.event_type
            JOIN n na ON na.week = a.week
            JOIN n nb ON nb.week = b.week
        )
        SELECT week_a, week_b,
               MAX(num) AS tv_num,
               ROUND(CAST(MAX(num) AS DOUBLE)
                     / (CAST(MAX(n_a) AS DOUBLE) * MAX(n_b)), 6) AS tv_max_r
        FROM p GROUP BY week_a, week_b
    """,
    tags=("drift", "total-variation", "events"),
)
def weekly_type_mix_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week drift of the event-type mix as the max per-type
    share change (the infinity-norm component of total-variation
    distance): the drift lens with a direct operational reading — "no
    event type's traffic share moved more than X points". Share
    differences are exact cross-multiplications |c1*n2 - c2*n1|
    (the ks_test_value_drift rule), divided once for display.

    Scale design: a (week, type) count, week totals, and a
    consecutive-week equi-join over the tiny mix relation — drift
    monitors never touch corpus-sized state after the first aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7
        )
        .cast("bigint")
        .alias("week"),
        "event_type",
    ).agg(F.count("*").alias("c"))
    n = w.groupBy("week").agg(F.sum("c").alias("n"))
    a = (
        w.join(n, "week")
        .select(
            F.col("week").alias("week_a"),
            "event_type",
            F.col("c").alias("ca"),
            F.col("n").alias("n_a"),
        )
    )
    b = (
        w.join(n, "week")
        .select(
            F.col("week").alias("week_b"),
            "event_type",
            F.col("c").alias("cb"),
            F.col("n").alias("n_b"),
        )
    )
    p = a.join(
        b,
        (F.col("week_b") == F.col("week_a") + 1)
        & (a["event_type"] == b["event_type"]),
    ).select(
        "week_a",
        "week_b",
        F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")).alias("num"),
        "n_a",
        "n_b",
    )
    return p.groupBy("week_a", "week_b").agg(
        F.max("num").alias("tv_num"),
        F.round(
            F.max("num").cast("double")
            / (F.max("n_a").cast("double") * F.max("n_b")),
            6,
        ).alias("tv_max_r"),
    )
