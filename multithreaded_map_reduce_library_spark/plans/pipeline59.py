"""Pipeline batch 59: the order-invariant corpus content signature
(dataset-versioning manifest row) and week-over-week total-variation
drift of the event-type mix (the third drift lens beside KS on values
and chi-squared on the full table: TV is the one with the "fraction of
traffic that changed type" reading).

Both exact-integer: the signature sums 48-bit content hashes mod 2^48
(commutative — partition order can never change it) with DECIMAL(38,0)
partials so the running sum cannot overflow int64 at any corpus size;
TV distances are max |c1*n2 - c2*n1| cross-multiplications over a FULL
OUTER per-type merge (a type that appears or vanishes between the two
weeks contributes its entire share), displayed on the _e6 grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import int_ratio_big
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_POW48 = 1 << 48


@register(
    "corpus_content_signature",
    oracle=f"""
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS n_bytes,
               CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),
                                        1, 12)) AS BIGINT)) % {_POW48} AS BIGINT)
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

    Overflow design (ADVICE r2): 48-bit terms summed as BIGINT would
    overflow int64 at ~32k documents — exactly the whole-corpus sizes
    the invariant exists for (DuckDB silently widens to INT128; Spark 4
    ANSI hard-errors). The Spark sum therefore runs in DECIMAL(38,0)
    (exact at any corpus size; Spark widens sum(decimal) precision
    automatically) and takes the modulus at the end.

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
    sig = (
        F.sum(h.cast("decimal(38,0)")) % F.lit(_POW48).cast("decimal(38,0)")
    ).cast("bigint")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(F.encode("text", "utf-8"))).alias("n_bytes"),
        sig.alias("content_sig"),
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
        m AS (
            SELECT COALESCE(a.week, b.week - 1) AS week_a,
                   COALESCE(a.event_type, b.event_type) AS event_type,
                   COALESCE(a.c, 0) AS ca,
                   COALESCE(b.c, 0) AS cb
            FROM w a FULL OUTER JOIN w b
              ON b.week = a.week + 1 AND b.event_type = a.event_type
        ),
        p AS (
            SELECT m.week_a, m.week_a + 1 AS week_b,
                   ABS(m.ca * nb.n - m.cb * na.n) AS num,
                   na.n AS n_a, nb.n AS n_b
            FROM m
            JOIN n na ON na.week = m.week_a
            JOIN n nb ON nb.week = m.week_a + 1
        )
        SELECT week_a, week_b,
               CAST(MAX(num) AS BIGINT) AS tv_num,
               CAST((MAX(num) // (MAX(n_a) * MAX(n_b))) * 1000000
                    + ((MAX(num) % (MAX(n_a) * MAX(n_b))) * 1000000
                       + (MAX(n_a) * MAX(n_b)) // 2) // (MAX(n_a) * MAX(n_b))
                    AS BIGINT) AS tv_max_e6
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
    (the ks_test_value_drift rule), displayed as an exact integer
    half-up ratio on the _e6 grid.

    FULL OUTER per-type merge (ADVICE r2): the round-2 inner join
    silently dropped any type present in only one of the two weeks, so
    a type whose traffic vanished or newly appeared — the largest
    possible share change — was invisible to the reported max. Types
    absent on one side now contribute COALESCE(c, 0), i.e. their full
    share; week totals come from the totals table, so only week pairs
    where both weeks exist are reported (unchanged).

    Scale design: a (week, type) count, week totals, and a
    consecutive-week full-outer merge over the tiny mix relation —
    drift monitors never touch corpus-sized state after the first
    aggregate. The n_a*n_b denominator product stays in BIGINT (safe to
    ~3e9 events/week; int_ratio_big keeps the scaled numerator exact).
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
    a = w.select(F.col("week").alias("wa"), F.col("event_type").alias("ta"), F.col("c").alias("ca"))
    b = w.select(F.col("week").alias("wb"), F.col("event_type").alias("tb"), F.col("c").alias("cb"))
    m = a.join(
        b,
        (F.col("wb") == F.col("wa") + 1) & (F.col("ta") == F.col("tb")),
        "full_outer",
    ).select(
        F.coalesce(F.col("wa"), F.col("wb") - 1).alias("week_a"),
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    na = n.select(F.col("week").alias("week_a"), F.col("n").alias("n_a"))
    nb = n.select((F.col("week") - 1).alias("week_a"), F.col("n").alias("n_b"))
    p = (
        m.join(na, "week_a")
        .join(nb, "week_a")
        .select(
            "week_a",
            (F.col("week_a") + 1).alias("week_b"),
            F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")).alias("num"),
            "n_a",
            "n_b",
        )
    )
    return p.groupBy("week_a", "week_b").agg(
        F.max("num").alias("tv_num"),
        int_ratio_big(
            F.max("num"), F.max("n_a") * F.max("n_b"), 6
        ).alias("tv_max_e6"),
    )
