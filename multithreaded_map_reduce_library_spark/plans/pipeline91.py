"""Pipeline batch 91 (round 4): RANKING-EVALUATION METRICS — the three
standard order-based evaluation scores, each computed EXACTLY (integer
rank arithmetic end to end, no floats anywhere):

* ``classifier_auc_exact`` — tie-corrected ROC AUC of a stopword-count
  English-ness score against the true ``lang='en'`` label, via the
  Mann-Whitney U identity AUC = U / (n1*n0). Average ranks for tied
  scores are kept exact by working with DOUBLED ranks (2*avg-rank =
  2*c_less + c_tied + 1, an integer).
* ``average_precision_ranking`` — AP of the same ranking: mean over
  positives of precision@i under a deterministic (score DESC, doc_id)
  global order.
* ``retrieval_mrr_eval`` — Mean Reciprocal Rank + precision@1 of the
  first purchase within each user's value-ranked event list (the
  "did the ranker put the conversion on top" retrieval-eval shape).

These close the evaluation-tier gap: the registry had rank *tests*
(Mann-Whitney) and lift/calibration diagnostics, but none of the
AUC/AP/MRR trio that every retrieval or quality-classifier pipeline
reports.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
evaluation tier; these extend the driver-mandated LLM-pipeline superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio,
    duck_int_ratio_big,
    int_ratio,
    int_ratio_big,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

# English-ness score: number of ' the ' occurrences (non-overlapping
# replace-and-measure — both engines replace all occurrences). Built
# lazily: Column expressions need an active session, and the registry is
# importable without one (the oracle type sweep does exactly that).
def _spark_score() -> F.Column:
    return (
        F.length(F.col("text")) - F.length(F.replace(F.col("text"), F.lit(" the ")))
    ) / F.lit(5)


_DUCK_SCORE = "(len(text) - len(replace(text, ' the ', ''))) // 5"


@register(
    "classifier_auc_exact",
    oracle=f"""
        WITH scored AS (
            SELECT CAST({_DUCK_SCORE} AS BIGINT) AS s,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
            FROM documents
        ),
        grp AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS npos
            FROM scored GROUP BY s
        ),
        ranked AS (
            SELECT s, n, npos,
                   CAST(COALESCE(SUM(n) OVER (ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS c_less
            FROM grp
        ),
        agg AS (
            SELECT CAST(SUM(npos * (2 * c_less + n + 1)) AS BIGINT) AS sum2r_pos,
                   CAST(SUM(npos) AS BIGINT) AS n_pos,
                   CAST(SUM(n - npos) AS BIGINT) AS n_neg
            FROM ranked
        )
        SELECT n_pos, n_neg,
               CAST(sum2r_pos - n_pos * (n_pos + 1) AS BIGINT) AS u2_stat,
               {duck_int_ratio_big("sum2r_pos - n_pos * (n_pos + 1)", "2 * n_pos * n_neg", 6)} AS auc_e6
        FROM agg
    """,
    tags=("evaluation", "ranking", "auc", "documents", "global-sort"),
)
def classifier_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC AUC of the ' the '-count English-ness score
    predicting ``lang='en'``, through the Mann-Whitney identity
    AUC = (R1 - n1(n1+1)/2) / (n1*n0) with average ranks for ties. All
    arithmetic is integer: doubled average ranks (2*avg = 2*c_less +
    n_tied + 1), doubled U, and an exact half-up e6 ratio at the end
    (overflow-safe quotient/remainder split — U*10^6 exceeds int64 once
    n1*n0 passes ~1e12, i.e. well inside 100 TB corpus sizes).

    Scale design: one fact-table scan folds to a distinct-score rollup
    (hundreds of rows at any corpus size — scores are small integers);
    the ordered cumulative window runs on that rollup only. The global
    sort the metric requires never touches the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        _spark_score().cast("bigint").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    grp = scored.groupBy("s").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("npos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grp.select(
        "s", "n", "npos", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("bigint").alias("c_less")
    )
    agg = ranked.agg(
        F.sum(F.col("npos") * (2 * F.col("c_less") + F.col("n") + 1))
        .cast("bigint")
        .alias("sum2r_pos"),
        F.sum("npos").cast("bigint").alias("n_pos"),
        F.sum(F.col("n") - F.col("npos")).cast("bigint").alias("n_neg"),
    )
    u2 = F.col("sum2r_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        "n_pos",
        "n_neg",
        u2.cast("bigint").alias("u2_stat"),
        int_ratio_big(u2, 2 * F.col("n_pos") * F.col("n_neg"), 6).alias("auc_e6"),
    )


@register(
    "average_precision_ranking",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST({_DUCK_SCORE} AS BIGINT) AS s,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
            FROM documents
        ),
        ranked AS (
            SELECT pos,
                   CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS i,
                   CAST(SUM(pos) OVER (ORDER BY s DESC, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cumpos
            FROM scored
        ),
        terms AS (
            SELECT {duck_int_ratio("cumpos", "i", 6)} AS prec_e6
            FROM ranked WHERE pos = 1
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM scored)
        SELECT n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_pos,
               {duck_int_ratio("SUM(prec_e6)", "COUNT(*)", 0)} AS ap_e6
        FROM terms CROSS JOIN n
        GROUP BY n_docs
    """,
    tags=("evaluation", "ranking", "average-precision", "documents", "global-sort"),
)
def average_precision_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Average Precision of the English-ness ranking: positives are
    ``lang='en'`` docs, the order is (score DESC, doc_id) — fully
    deterministic — and AP = mean over positives of precision@i. Each
    precision is an exact half-up e6 integer ratio; their mean is an
    exact half-up integer ratio of those (the nested-rounding contract
    is part of the metric definition here, identical in both engines).

    Scale design: AP is inherently a single global ranking — the one
    place a total order is the semantics, not an implementation choice.
    The ranked relation carries only (pos, i, cumpos); at 100 TB the
    order-by ships two integers per doc through a range-partitioned
    sort, and the final rollup is a grand aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        _spark_score().cast("bigint").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    order = [F.desc("s"), F.asc("doc_id")]
    wrow = Window.orderBy(*order)
    wcum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    ranked = scored.select(
        "pos",
        F.row_number().over(wrow).cast("bigint").alias("i"),
        F.sum("pos").over(wcum).cast("bigint").alias("cumpos"),
    )
    terms = ranked.where(F.col("pos") == 1).select(
        int_ratio(F.col("cumpos"), F.col("i"), 6).alias("prec_e6")
    )
    n = scored.agg(F.count("*").cast("bigint").alias("n_docs"))
    return (
        terms.crossJoin(F.broadcast(n))  # 1-row grand aggregate (BNLJ-exempt)
        .groupBy("n_docs")
        .agg(
            F.count("*").cast("bigint").alias("n_pos"),
            int_ratio(F.sum("prec_e6"), F.count("*"), 0).alias("ap_e6"),
        )
        .select("n_docs", "n_pos", "ap_e6")
    )


@register(
    "retrieval_mrr_eval",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY value DESC NULLS LAST, event_id) AS BIGINT) AS rn,
                   user_id
            FROM events
        ),
        firsts AS (
            SELECT user_id, CAST(MIN(rn) AS BIGINT) AS first_rank
            FROM ranked WHERE event_type = 'purchase'
            GROUP BY user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               {duck_int_ratio("SUM(" + duck_int_ratio("1", "first_rank", 6) + ")", "COUNT(*)", 0)} AS mrr_e6,
               {duck_int_ratio("SUM(CASE WHEN first_rank = 1 THEN 1 ELSE 0 END)", "COUNT(*)", 6)} AS p_at_1_e6
        FROM firsts
    """,
    tags=("evaluation", "ranking", "mrr", "events"),
)
def retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Reciprocal Rank and precision@1 of the first purchase inside
    each user's (value DESC NULLS LAST, event_id) event ranking — the
    retrieval-eval question "does ranking a user's events by value put a
    conversion first". Reciprocal ranks are exact half-up e6 integers;
    their mean is an exact integer ratio of those (nested-rounding
    contract, identical both engines). Users with no purchase are out of
    scope by MRR's definition.

    Scale design: the window is partitioned by user — no global order
    anywhere — and everything after it is a user-level rollup into one
    grand aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc_nulls_last("value"), F.asc("event_id")
    )
    ranked = ev.select(
        "event_type", F.row_number().over(w).cast("bigint").alias("rn"), "user_id"
    )
    firsts = (
        ranked.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").cast("bigint").alias("first_rank"))
    )
    rr_e6 = int_ratio(F.lit(1), F.col("first_rank"), 6)
    return firsts.agg(
        F.count("*").cast("bigint").alias("n_users"),
        int_ratio(F.sum(rr_e6), F.count("*"), 0).alias("mrr_e6"),
        int_ratio(
            F.sum(F.when(F.col("first_rank") == 1, 1).otherwise(0)), F.count("*"), 6
        ).alias("p_at_1_e6"),
    )
