"""Pipeline batch 88 (round 4): SORT-ORDER COMPRESSION AUDIT + SENTENCE
SEGMENTATION STATS — a physical-layout what-if and a text-structure
profile.

* ``rle_sort_order_audit`` — answers "which sort order compresses this
  table best?" by measuring run-length-encoding run counts of the
  low-cardinality columns under two candidate orders (the storage
  counterpart of the z-order/hilbert locality scores, which measure
  predicate locality instead): runs(col | order) = 1 + Σ 1[vᵢ ≠ vᵢ₋₁].
  A date-sorted rewrite collapses status/priority runs dramatically —
  the number that justifies paying for the rewrite sort.
* ``sentence_length_stats`` — per-language sentence segmentation profile
  (terminator-split): sentence counts, mean sentence length in
  tokens, and the share of long sentences — the structural text signal
  that separates prose from listy/boilerplate content, complementing the
  token- and character-level quality tiers.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
neither tier; both queries extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


def _duck_runs(col: str, order: str, label: str) -> str:
    return f"""
            SELECT '{col}' AS col, '{label}' AS sort_order,
                   CAST(SUM(CASE WHEN {col} IS DISTINCT FROM prev THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_runs,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM (
                SELECT {col}, LAG({col}) OVER (ORDER BY {order}) AS prev
                FROM orders
            )
    """


@register(
    "rle_sort_order_audit",
    oracle=f"""
        WITH runs AS (
            {_duck_runs('o_orderstatus', 'o_orderkey', 'by_key')}
            UNION ALL
            {_duck_runs('o_orderpriority', 'o_orderkey', 'by_key')}
            UNION ALL
            {_duck_runs('o_orderstatus', 'o_orderdate, o_orderkey', 'by_date')}
            UNION ALL
            {_duck_runs('o_orderpriority', 'o_orderdate, o_orderkey', 'by_date')}
        )
        SELECT col, sort_order, n_runs, n_rows,
               {duck_int_ratio('n_runs', 'n_rows', 6)} AS run_ratio_e6
        FROM runs
    """,
    tags=("storage", "compression", "rle", "orders", "layout", "global-sort"),
)
def rle_sort_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE compressibility under candidate sort orders: for the two
    low-cardinality order columns (status, priority), count the value
    runs the table would store when physically sorted by key
    (arrival-order proxy) vs by date — run_ratio = runs/rows is the
    inverse RLE compression factor. Date order groups temporally
    correlated statuses, so its run counts drop; this audit prices that
    benefit before a 100 TB rewrite buys it.

    Scale design: this is a deliberate what-if SORT — the measured sort
    is the same one the rewrite job would execute, and each run count is
    a lag-window pass over it. The two orders share one scan each; the
    rollup is 4 rows. (At cluster scale the sort is range-partitioned;
    counting runs per partition + boundary pairs gives the identical
    total — the two-pass prefix-sum precedent.)"""
    orders = load_table(spark, sf_dir, "orders")

    def runs(col: str, order_cols, label: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        return (
            orders.select(F.col(col).alias("v"), *[F.col(c) for c in order_cols])
            .select("v", F.lag("v").over(w).alias("prev"))
            .agg(
                F.sum(
                    F.when(~F.col("v").eqNullSafe(F.col("prev")), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("n_runs"),
                F.count("*").cast("bigint").alias("n_rows"),
            )
            .select(
                F.lit(col).alias("col"),
                F.lit(label).alias("sort_order"),
                "n_runs",
                "n_rows",
            )
        )

    out = (
        runs("o_orderstatus", ["o_orderkey"], "by_key")
        .unionAll(runs("o_orderpriority", ["o_orderkey"], "by_key"))
        .unionAll(runs("o_orderstatus", ["o_orderdate", "o_orderkey"], "by_date"))
        .unionAll(runs("o_orderpriority", ["o_orderdate", "o_orderkey"], "by_date"))
    )
    return out.select(
        "col",
        "sort_order",
        "n_runs",
        "n_rows",
        int_ratio(F.col("n_runs"), F.col("n_rows"), 6).alias("run_ratio_e6"),
    )


_LONG_SENT = 12  # tokens


@register(
    "sentence_length_stats",
    oracle=f"""
        WITH sent AS (
            SELECT lang, s AS sentence
            FROM documents,
                 UNNEST(string_split_regex(text, '[.!?]+')) AS t(s)
            WHERE trim(s) <> ''
        ),
        toks AS (
            SELECT lang,
                   length(regexp_replace(trim(sentence), '[ \\t\\r\\n]+', ' ', 'g'))
                     - length(replace(regexp_replace(trim(sentence), '[ \\t\\r\\n]+', ' ', 'g'), ' ', ''))
                     + 1 AS n_tokens
            FROM sent
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_sentences,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               {duck_int_ratio('CAST(SUM(n_tokens) AS BIGINT)', 'COUNT(*)', 2)} AS mean_len_e2,
               {duck_int_ratio(f'CAST(SUM(CASE WHEN n_tokens >= {_LONG_SENT} THEN 1 ELSE 0 END) AS BIGINT)', 'COUNT(*)', 6)} AS long_share_e6
        FROM toks
        GROUP BY lang
    """,
    tags=("text", "sentence", "segmentation", "documents"),
)
def sentence_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-structure profile per language: documents split on
    terminator runs ([.!?]+), blank fragments dropped, token counts per
    sentence via whitespace-run normalization, rolled up to sentence
    count, mean sentence length (e2 grid), and the share of long (≥12
    token) sentences. Prose has moderate means and a fat long-sentence
    share; listy/boilerplate content collapses toward 1-2 tokens — a
    structural quality axis the token- and character-level screens
    (doc_token_stats, letter_entropy_quality) don't see.

    Scale design: explode-on-split is map-side (sentences stay inside
    the doc's partition); the only shuffle is the per-language rollup,
    map-side combined."""
    docs = load_table(spark, sf_dir, "documents")
    sent = docs.select(
        "lang",
        F.explode(F.split(F.col("text"), "[.!?]+")).alias("sentence"),
    ).where(F.trim(F.col("sentence")) != "")
    norm = F.regexp_replace(F.trim(F.col("sentence")), "[ \\t\\r\\n]+", " ")
    toks = sent.select(
        "lang",
        (
            F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + F.lit(1)
        ).alias("n_tokens"),
    )
    return toks.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_sentences"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        int_ratio(F.sum("n_tokens"), F.count("*"), 2).alias("mean_len_e2"),
        int_ratio(
            F.sum(F.when(F.col("n_tokens") >= _LONG_SENT, 1).otherwise(0)),
            F.count("*"),
            6,
        ).alias("long_share_e6"),
    )
