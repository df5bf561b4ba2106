"""Pipeline batch 18: contrastive training-set construction — turn the
dedup pipeline's near-duplicate pairs into (anchor, positive, negative)
triplets for contrastive embedding training (SimCSE/E5-style): the
near-dup partner is the positive, and negatives are content-addressed
pseudo-random documents. The step that converts a cleaning byproduct
(duplicate pairs) into a training asset.

Exactness: positives come from the MinHash audit pairs (est is an exact
binary rational); negatives are md5-derived indices modulo the corpus
size — integers end to end, no floats displayed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.evaluation import (
    _mh_est_oracle,
    minhash_estimate_error,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_POS_T = 0.5   # minimum sketch-estimated Jaccard for a positive pair
_NEG_K = 3     # negatives per anchor


@register(
    "contrastive_training_pairs",
    oracle=f"""
        WITH base AS ({_mh_est_oracle()}),
        pos AS (
            SELECT id_a AS anchor, id_b AS positive
            FROM base WHERE est >= {_POS_T}
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        slots AS (SELECT unnest([{", ".join(str(i) for i in range(1, _NEG_K + 1))}]) AS slot),
        cand AS (
            SELECT anchor, positive, slot,
                   CAST(('0x' || substr(md5('neg|' || CAST(anchor AS VARCHAR)
                        || '|' || CAST(slot AS VARCHAR)), 1, 8)) AS BIGINT)
                       % n.n_docs AS negative
            FROM pos CROSS JOIN slots CROSS JOIN n
        )
        SELECT anchor, positive, slot, negative
        FROM cand
        WHERE negative <> anchor AND negative <> positive
    """,
    tags=("corpus", "contrastive", "training-set", "dedup", "documents"),
)
def contrastive_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triplets for contrastive training:
    anchors and positives are near-duplicate pairs from the production
    MinHash-LSH path (sketch estimate >= 0.5 — text pairs a bi-encoder
    should embed together); each anchor gets 3 content-addressed
    negatives, md5(anchor, slot) modulo corpus size, with collisions
    against the anchor or its positive dropped deterministically.
    Content-addressing makes the training set reproducible across
    re-runs and incremental ingests — same property as
    ``dataset_split_assignment``.

    Scale design: the pair source is the candidate-restricted LSH audit
    (never all-pairs); negative generation is a map-side hash over a
    3-row slot relation; the corpus-size scalar broadcasts. In a real
    pipeline the final step joins text back by id — a sliver-sized
    semi-join, same shape as the LSH verification pass. Output is
    integers only."""
    pairs = minhash_estimate_error(spark, sf_dir)
    pos = pairs.filter(F.col("est") >= _POS_T).select(
        F.col("id_a").alias("anchor"), F.col("id_b").alias("positive")
    )
    n = load_table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    slots = spark.createDataFrame([(i,) for i in range(1, _NEG_K + 1)], "slot int")
    neg = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("neg|"),
                        F.col("anchor").cast("string"),
                        F.lit("|"),
                        F.col("slot").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % F.col("n_docs")
    )
    return (
        pos.crossJoin(F.broadcast(slots))
        .crossJoin(F.broadcast(n))
        .withColumn("negative", neg)
        .filter((F.col("negative") != F.col("anchor")) & (F.col("negative") != F.col("positive")))
        .select("anchor", "positive", "slot", "negative")
    )


@register(
    "corpus_cleaning_report",
    oracle=r"""
        WITH t AS (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(text, '[ \t\r\n]'), x -> x <> '') AS toks,
                   md5(text) AS h
            FROM documents
        ),
        lines AS (
            SELECT doc_id,
                   unnest(list_transform(range(len(toks) // 3),
                       i -> array_to_string(list_slice(toks, i * 3 + 1, i * 3 + 3), ' '))) AS line
            FROM t
        ),
        boiler AS (
            SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 3
        ),
        u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        tf AS (SELECT doc_id, tok, COUNT(*) AS f FROM u GROUP BY doc_id, tok),
        uni AS (SELECT tok, COUNT(*) AS c FROM u GROUP BY tok),
        tot AS (SELECT COUNT(*) AS n FROM u),
        bits AS (
            SELECT tf.doc_id, SUM(tf.f) AS n_toks,
                   CAST(SUM(CAST(FLOOR(tf.f * (ln(CAST(tot.n AS DOUBLE) / uni.c) / ln(2.0))
                        * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / CAST(SUM(tf.f) AS DOUBLE) / 10000.0 AS avg_bits
            FROM tf JOIN uni USING (tok) CROSS JOIN tot GROUP BY tf.doc_id
        )
        SELECT (SELECT COUNT(*) FROM t) AS n_docs,
               (SELECT CAST(SUM(len(toks)) AS BIGINT) FROM t) AS n_tokens,
               (SELECT COUNT(*) - COUNT(DISTINCT h) FROM t) AS n_exact_dup_docs,
               (SELECT COUNT(*) FROM boiler) AS n_boiler_lines,
               (SELECT COUNT(*) FROM lines JOIN boiler USING (line)) AS n_boiler_slots,
               (SELECT COUNT(*) FROM bits WHERE avg_bits < 3.0 OR avg_bits > 6.0)
                   AS n_quality_outliers,
               (SELECT COUNT(DISTINCT lang) FROM t) AS n_langs
    """,
    tags=("corpus", "report", "text-cleaning", "documents"),
)
def corpus_cleaning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row cleaning report card a corpus pipeline prints at the
    end of a run: corpus size, exact-duplicate documents, boilerplate
    line vocabulary and affected slots, unigram-LM quality outliers
    (outside the 3-6 bits/token band), and language count — the
    dashboard row that gets compared run-over-run to catch ingest
    regressions.

    Scale design: one token pass feeds everything (the CTEs share the
    scan); each statistic is a skinny aggregate with map-side combine;
    the report is a single row, so the final collect moves seven
    numbers. All displayed values are integers (the quality band reuses
    ``doc_unigram_logprob``'s grid discipline internally)."""
    from multithreaded_map_reduce_library_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", tokens("text").alias("toks"), F.md5("text").alias("h")
    )
    n_full = (F.size("toks") / 3).cast("bigint")
    lines_arr = F.when(
        n_full > 0,
        F.transform(
            F.sequence(F.lit(0), n_full - 1),
            lambda i: F.array_join(F.slice("toks", (i * 3 + 1).cast("int"), 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    lines = t.select("doc_id", F.explode(lines_arr).alias("line"))
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 3)
        .select("line")
    )
    u = t.select("doc_id", F.explode("toks").alias("tok"))
    tf = u.groupBy("doc_id", "tok").agg(F.count("*").alias("f"))
    uni = u.groupBy("tok").agg(F.count("*").alias("c"))
    tot = u.agg(F.count("*").alias("n"))
    bitsq = (
        F.floor(
            F.col("f")
            * (F.log(F.col("n").cast("double") / F.col("c")) / F.log(F.lit(2.0)))
            * 10000.0
            + 0.5
        ).cast("bigint")
    )
    bits = (
        tf.join(F.broadcast(uni), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            (
                F.sum(bitsq).cast("double") / F.sum("f").cast("double") / F.lit(10000.0)
            ).alias("avg_bits")
        )
    )
    a = t.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks")).alias("n_tokens"),
        (F.count("*") - F.countDistinct("h")).alias("n_exact_dup_docs"),
        F.countDistinct("lang").alias("n_langs"),
    )
    b = boiler.agg(F.count("*").alias("n_boiler_lines"))
    c = lines.join(boiler, "line").agg(F.count("*").alias("n_boiler_slots"))
    d = bits.filter((F.col("avg_bits") < 3.0) | (F.col("avg_bits") > 6.0)).agg(
        F.count("*").alias("n_quality_outliers")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(d))
        .select(
            "n_docs",
            "n_tokens",
            "n_exact_dup_docs",
            "n_boiler_lines",
            "n_boiler_slots",
            "n_quality_outliers",
            "n_langs",
        )
    )
