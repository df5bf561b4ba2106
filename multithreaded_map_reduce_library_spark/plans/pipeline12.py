"""Pipeline batch 12: corpus selection under a token budget and SCD1
upsert merge — the two remaining bookkeeping moves of a training-data
pipeline: "pick the best documents until the budget is spent" and
"fold today's changed rows into the serving snapshot".

Reference parity note: none of this exists in the reference (public
surface = ``mapreduce.h:44-83``); driver-mandated LLM-pipeline superset.

Float discipline: the quality density used for ranking is a ratio of
integers (IEEE-exact); ordering ties break on doc_id; displayed columns
are integers only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.text import tokens
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_BUDGET_TOKENS = 20000


@register(
    "corpus_greedy_budget_selection",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split_regex(text, '[ \t\r\n]'), t -> t <> ''))
                       AS n_toks,
                   len(list_distinct(list_filter(string_split_regex(text, '[ \t\r\n]'),
                                                 t -> t <> ''))) AS n_types
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang, n_toks,
                   CAST(n_types AS DOUBLE) / n_toks AS density,
                   SUM(n_toks) OVER (
                       ORDER BY CAST(n_types AS DOUBLE) / n_toks DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_toks
            FROM d WHERE n_toks > 0
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM r WHERE cum_toks <= {_BUDGET_TOKENS}
        GROUP BY lang
    """,
    tags=("corpus", "selection", "budget", "documents"),
)
def corpus_greedy_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy corpus selection under a global token budget: rank
    documents by lexical quality density (type/token ratio — a
    repetition-penalizing quality proxy), admit in rank order until the
    cumulative token count exceeds the budget, report the per-language
    composition of the selected set. The "fill the training mix with the
    best data first" step that follows scoring and precedes packing.

    Scale design: the score is map-side; the global rank+cumulative-sum
    is a single-key window — fine here, but at 100 TB the selection
    becomes threshold-based: approx-quantile the density distribution to
    find the cut t where the expected admitted tokens ≈ budget, admit
    density > t map-side, and only rank the marginal stratum around t
    (the standard two-pass fix that avoids any global sort). The greedy
    set is identical because admission is monotone in density.

    Ordering ties: density is a ratio of two small integers, so distinct
    documents share densities often — doc_id breaks every tie, making
    the admitted set unique and both engines' cumulative sums integral
    and identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_types"),
    ).filter(F.col("n_toks") > 0)
    density = F.col("n_types").cast("double") / F.col("n_toks")
    w = (
        Window.orderBy(density.desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = d.select(
        "doc_id", "lang", "n_toks", F.sum("n_toks").over(w).alias("cum_toks")
    )
    return (
        r.filter(F.col("cum_toks") <= _BUDGET_TOKENS)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "scd1_upsert_merge",
    oracle="""
        WITH base AS (
            SELECT user_id, SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS v_e4,
                   COUNT(*) AS n
            FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
            GROUP BY user_id
        ),
        delta AS (
            SELECT user_id, SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS v_e4,
                   COUNT(*) AS n
            FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
            GROUP BY user_id
        )
        SELECT COALESCE(base.user_id, delta.user_id) AS user_id,
               CAST(COALESCE(base.v_e4, 0) + COALESCE(delta.v_e4, 0) AS BIGINT) AS v_e4,
               COALESCE(base.n, 0) + COALESCE(delta.n, 0) AS n,
               CASE WHEN base.user_id IS NULL THEN 'insert'
                    WHEN delta.user_id IS NULL THEN 'keep'
                    ELSE 'update' END AS op
        FROM base FULL OUTER JOIN delta USING (user_id)
    """,
    tags=("warehouse", "merge", "upsert", "cdc", "events"),
)
def scd1_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-1 upsert: fold a change batch (events on/after Jan 20)
    into the serving snapshot (events before), emitting the merged state
    plus the MERGE op each key took (insert / update / keep) — the audit
    column a MERGE INTO statement logs. Complements ``scd2_user_value_
    tiers`` (history-keeping) with the overwrite-in-place variant.

    Scale design: both sides pre-aggregate BEFORE the merge join (the
    partial-aggregate-then-merge shape that makes daily snapshot+delta
    maintenance linear in the delta, not the snapshot — at 100 TB the
    base side is the stored aggregate table, never recomputed); the full
    outer join shuffles two already-skinny keyed aggregates. Sums ride
    the 1e4 integer grid (order-invariant)."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    v_e4 = F.sum(F.floor(F.col("value") * 10000).cast("bigint")).alias("v_e4")

    def side(pred):
        return e.filter(pred).groupBy("user_id").agg(v_e4, F.count("*").alias("n"))

    base = side(F.col("ts") < cut)
    delta = side(F.col("ts") >= cut)
    b, d = base.alias("b"), delta.alias("d")
    j = b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer")
    op = (
        F.when(F.col("b.user_id").isNull(), "insert")
        .when(F.col("d.user_id").isNull(), "keep")
        .otherwise("update")
    )
    return j.select(
        F.coalesce(F.col("b.user_id"), F.col("d.user_id")).alias("user_id"),
        (F.coalesce(F.col("b.v_e4"), F.lit(0)) + F.coalesce(F.col("d.v_e4"), F.lit(0))).alias("v_e4"),
        (F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
        op.alias("op"),
    )
