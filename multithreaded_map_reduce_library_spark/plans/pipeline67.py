"""Pipeline batch 67: three data-platform governance/selection operators —

* ``bpe_oov_rate_by_lang`` — vocabulary coverage audit: share of corpus
  words the learned BPE vocab does NOT cover, per language (the
  complement of pipeline64's fertility: fertility says how expensive
  covered words are, OOV rate says how much text the tokenizer can't
  segment at all without byte fallback).
* ``winnowing_fingerprints`` — the MOSS winnowing scheme (Schleimer,
  Wilkerson & Aiken, SIGMOD 2003): per shingle-hash window keep the
  minimum hash; the distinct selected hashes are the document's
  fingerprint set, with the guarantee that any shared run of >= w+n-1
  words between two documents shares at least one fingerprint.
* ``k_anonymity_release`` — release-gating aggregate: (event_type, day)
  cells are published only when >= K distinct users contribute,
  suppressed otherwise — the k-anonymity rule every aggregate data
  release applies before leaving the trust boundary.

All-integer outputs (counts and int_ratio grids); every oracle replays
the exact same md5/window arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.pipeline import (
    _duck_h32,
    _duck_shingles,
)
from multithreaded_map_reduce_library_spark.plans.pipeline22 import (
    _bpe_chain_sql,
    _bpe_learn,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_W = 4  # winnowing window (in shingle positions)
_N = 3  # shingle width (words)
_K_ANON = 5  # k-anonymity threshold


def _oov_oracle() -> str:
    chain, final, _ = _bpe_chain_sql()
    return f"""
        WITH {chain},
        dw AS (SELECT d.lang,
                      lower(unnest(list_filter(string_split_regex(d.text, '[ \t\r\n]'),
                                               x -> x <> ''))) AS word
               FROM documents d),
        j AS (SELECT dw.lang,
                     CASE WHEN {final}.word IS NULL THEN 1 ELSE 0 END AS oov
              FROM dw LEFT JOIN {final} USING (word)),
        g AS (SELECT lang, COUNT(*) AS n_words,
                     CAST(SUM(oov) AS BIGINT) AS n_oov
              FROM j GROUP BY lang)
        SELECT lang, n_words, n_oov,
               {duck_int_ratio('n_oov', 'n_words', 6)} AS oov_rate_e6
        FROM g
    """


@register(
    "bpe_oov_rate_by_lang",
    oracle=_oov_oracle(),
    tags=("tokenizer", "bpe", "oov", "coverage"),
)
def bpe_oov_rate_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary COVERAGE audit: per language, total whitespace words,
    words absent from the learned BPE vocabulary (would need byte
    fallback), and the OOV rate on the exact _e6 grid. Together with
    `bpe_fertility_by_lang` this is the standard two-number tokenizer
    scorecard per language.

    Scale design: same broadcast-vocab left join as the fertility query
    — corpus streams map-side, the anti-match is a null check on the
    broadcast side, one |langs|-row aggregate finishes."""
    vocab, _ = _bpe_learn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[ \t\r\n]"), lambda t: t != F.lit(""))
    dw = docs.select("lang", F.explode(toks).alias("w")).select(
        "lang", F.lower("w").alias("word")
    )
    vw = vocab.select("word", F.lit(1).alias("_in_vocab"))
    g = (
        dw.join(F.broadcast(vw), "word", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    return g.select(
        "lang",
        "n_words",
        "n_oov",
        int_ratio(F.col("n_oov"), F.col("n_words"), 6).alias("oov_rate_e6"),
    )


@register(
    "winnowing_fingerprints",
    oracle=f"""
        WITH sh AS (SELECT doc_id, {_duck_shingles(_N)} AS s FROM documents),
        pos AS (SELECT doc_id, p, {_duck_h32('s[p]')} AS h
                FROM (SELECT doc_id, s, unnest(range(1, len(s) + 1)) AS p
                      FROM sh)),
        n AS (SELECT doc_id, COUNT(*) AS n_pos FROM pos GROUP BY doc_id),
        -- window first, filter after: SQL WHERE runs before window
        -- functions, and filtering the tail rows first would shrink the
        -- last frames (Spark computes fp over ALL positions, then keeps
        -- only full windows)
        wmin AS (SELECT doc_id, p, fp FROM (
                     SELECT pos.doc_id, pos.p, n.n_pos,
                            MIN(pos.h) OVER (PARTITION BY pos.doc_id ORDER BY pos.p
                                             ROWS BETWEEN CURRENT ROW
                                             AND {_W - 1} FOLLOWING) AS fp
                     FROM pos JOIN n USING (doc_id))
                 WHERE p <= n_pos - {_W - 1}),
        fps AS (SELECT doc_id, COUNT(DISTINCT fp) AS n_fingerprints,
                       COUNT(*) AS n_windows
                FROM wmin GROUP BY doc_id)
        SELECT n.doc_id,
               CAST(n.n_pos AS BIGINT) AS n_shingles,
               CAST(COALESCE(f.n_windows, 0) AS BIGINT) AS n_windows,
               CAST(COALESCE(f.n_fingerprints, 0) AS BIGINT) AS n_fingerprints,
               CASE WHEN COALESCE(f.n_windows, 0) = 0 THEN 0
                    ELSE {duck_int_ratio('f.n_fingerprints', 'f.n_windows', 4)}
               END AS density_e4
        FROM n LEFT JOIN fps f USING (doc_id)
    """,
    tags=("dedup", "fingerprinting", "winnowing"),
    bench=True,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing (SIGMOD 2003): hash every word 3-gram shingle,
    slide a window of w=4 consecutive positions, and keep each window's
    MINIMUM hash; the distinct kept hashes are the document fingerprint
    set. Guarantee: two documents sharing any run of >= w+n-1 = 6 words
    share a fingerprint — a detection floor MinHash cannot promise.
    Output per doc: shingle count, window count, fingerprint count, and
    density (selected/window, _e4 grid — expected ~2/(w+1)); docs
    shorter than one window report zero windows.

    Scale design: hashing is one map-side md5 pass (the fused
    shingle-hash expression); the window minimum partitions BY DOCUMENT
    ordered by position — co-partitioned, no global sort; the
    fingerprint index this builds joins documents by fp exactly like
    the LSH band-key join, never all-pairs."""
    from multithreaded_map_reduce_library_spark.functions.text import (
        tokens,
        word_shingle_hash32,
    )

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(word_shingle_hash32(tokens("text"), _N)).alias("p0", "h"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "h")
    n = pos.groupBy("doc_id").agg(F.count("*").alias("n_pos"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, _W - 1)
    )
    wmin = (
        pos.join(n, "doc_id")
        .withColumn("fp", F.min("h").over(w))
        .filter(F.col("p") <= F.col("n_pos") - (_W - 1))
    )
    fps = wmin.groupBy("doc_id").agg(
        F.countDistinct("fp").alias("n_fingerprints"),
        F.count("*").alias("n_windows"),
    )
    return (
        n.join(fps, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_pos").cast("bigint").alias("n_shingles"),
            F.coalesce(F.col("n_windows"), F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce(F.col("n_fingerprints"), F.lit(0))
            .cast("bigint")
            .alias("n_fingerprints"),
            F.when(F.coalesce(F.col("n_windows"), F.lit(0)) == 0, F.lit(0).cast("bigint"))
            .otherwise(int_ratio(F.col("n_fingerprints"), F.col("n_windows"), 4))
            .alias("density_e4"),
        )
    )


@register(
    "k_anonymity_release",
    oracle=f"""
        WITH cells AS (
            SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   COUNT(DISTINCT user_id) AS n_users,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        audit AS (
            SELECT CAST(SUM(CASE WHEN n_users < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_suppressed
            FROM cells
        )
        SELECT c.event_type, c.day,
               CAST(c.n_users AS BIGINT) AS n_users,
               CAST(c.n_events AS BIGINT) AS n_events,
               a.n_suppressed
        FROM cells c CROSS JOIN audit a
        WHERE c.n_users >= {_K_ANON}
    """,
    tags=("governance", "k-anonymity", "privacy", "events"),
)
def k_anonymity_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate over the (event_type, day) aggregate:
    publish a cell only when >= k=5 DISTINCT users contribute to it, so
    no released row can be pinned to fewer than 5 people; every row also
    carries the global count of suppressed cells (the release's
    disclosure-audit line). This is the standard minimum-cell-size rule
    aggregate exports apply at the trust boundary.

    Scale design: one distinct-user aggregate per cell (the shuffle is
    on the release key), the suppression audit is a 1-row grand
    aggregate broadcast back across released rows — no second scan of
    the fact table."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )
    audit = cells.agg(
        F.sum(F.when(F.col("n_users") < _K_ANON, 1).otherwise(0))
        .cast("bigint")
        .alias("n_suppressed")
    )
    return (
        cells.filter(F.col("n_users") >= _K_ANON)
        .join(F.broadcast(audit))  # 1-row grand aggregate (BNLJ-exempt)
        .select("event_type", "day", "n_users", "n_events", "n_suppressed")
    )
