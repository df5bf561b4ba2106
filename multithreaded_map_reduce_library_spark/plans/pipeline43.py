"""Pipeline batch 43: heuristic-classifier evaluation (the lang-ID
confusion matrix against ground-truth labels) and inter-event dwell
medians per Markov transition — closing the eval loop on two earlier
operators. Pure integers; medians are exact rank picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.pipeline import _duck_lang_id_sql
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "langid_confusion_matrix",
    oracle=f"""
        WITH pred AS ({_duck_lang_id_sql()})
        SELECT labeled_lang, pred_lang, COUNT(*) AS n_docs
        FROM pred GROUP BY labeled_lang, pred_lang
    """,
    tags=("evaluation", "lang-id", "confusion-matrix", "documents"),
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-evidence language identifier
    (`lang_id_heuristic`) against the ground-truth lang column — the
    eval every heuristic filter needs before it gates a corpus (the
    diagonal is per-language recall mass; 'und' rows are the abstain
    bucket). The oracle replays prediction AND evaluation.

    Scale design: prediction is the existing map-side expression; the
    matrix is one |langs|² rollup with map-side combine.
    """
    from multithreaded_map_reduce_library_spark.operators import textstats as T

    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("labeled_lang"), T.lang_id("text").alias("pred_lang")
    )
    return pred.groupBy("labeled_lang", "pred_lang").agg(
        F.count("*").alias("n_docs")
    )


@register(
    "transition_gap_medians",
    oracle="""
        WITH s AS (
            SELECT user_id, event_type AS cur, ts, event_id,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC) AS nxt,
                   LEAD(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC) AS nxt_ts
            FROM events
        ),
        g AS (
            SELECT cur, nxt,
                   CAST(FLOOR(epoch(nxt_ts - ts) / 60) AS BIGINT) AS gap_min,
                   user_id, event_id
            FROM s WHERE nxt IS NOT NULL
        ),
        r AS (
            SELECT cur, nxt, gap_min,
                   ROW_NUMBER() OVER (PARTITION BY cur, nxt
                                      ORDER BY gap_min ASC, user_id ASC,
                                               event_id ASC) AS rk,
                   COUNT(*) OVER (PARTITION BY cur, nxt) AS np
            FROM g
        )
        SELECT cur, nxt, np AS n_gaps, gap_min AS median_gap_min
        FROM r WHERE rk = (np + 1) // 2
    """,
    tags=("analytics", "sequence", "dwell", "events"),
)
def transition_gap_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median dwell time (minutes) between consecutive events per
    (current, next) event-type transition — the timing companion of
    `event_markov_transitions` (which transitions happen) and
    `markov_conditional_entropy` (how predictable they are): this says
    how LONG each step takes. Exact lower-median rank pick over integer
    minute gaps with full tiebreaks.

    Scale design: one user-partitioned LEAD window (no global order),
    then per-transition rank windows over a 25-partition relation.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    s = ev.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("cur"),
        "ts",
        F.lead("event_type").over(w).alias("nxt"),
        F.lead("ts").over(w).alias("nxt_ts"),
    ).where(F.col("nxt").isNotNull())
    g = s.select(
        "cur",
        "nxt",
        F.floor(
            (F.unix_timestamp("nxt_ts") - F.unix_timestamp("ts")) / 60
        )
        .cast("bigint")
        .alias("gap_min"),
        "user_id",
        "event_id",
    )
    wr = Window.partitionBy("cur", "nxt")
    r = g.select(
        "cur",
        "nxt",
        "gap_min",
        F.row_number()
        .over(wr.orderBy(F.asc("gap_min"), F.asc("user_id"), F.asc("event_id")))
        .alias("rk"),
        F.count("*").over(wr).alias("np"),
    )
    return r.where(F.col("rk") == ((F.col("np") + 1) / 2).cast("bigint")).select(
        "cur",
        "nxt",
        F.col("np").alias("n_gaps"),
        F.col("gap_min").alias("median_gap_min"),
    )
