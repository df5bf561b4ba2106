"""Pipeline batch 83 (round 4): SOURCE LEAVE-ONE-OUT VALUATION + k-FOLD
CROSS-VALIDATION — data-valuation and model-validation staples, both
computed from ONE aggregate pass (no per-fold rescans).

* ``source_loo_contribution`` — leave-one-out data valuation at source
  granularity: corpus quality M(S) = share of docs in the 'good' length
  band; each source's contribution is M(all) − M(all∖s), computed from
  per-source counts subtracted from grand totals — the cheapest member
  of the Shapley family, and the report a corpus curator reads to decide
  which feed to cut. Exact signed integer-ratio arithmetic.
* ``kfold_cv_mae`` — 5-fold cross-validation of the segment-mean price
  model (the conformal query's model, pipeline80) WITHOUT scanning the
  data per fold: one (segment × fold) aggregate gives every fold's
  training stats by subtraction (train = total − own fold), then each
  held-out row scores against its fold's prediction. Per-fold MAE in
  half-up cents — the variance across folds is the model-stability
  signal CV exists to measure.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
evaluation tier; both queries extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_GOOD_LO = 200
_GOOD_HI = 2000


@register(
    "source_loo_contribution",
    oracle=f"""
        WITH per AS (
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN n_chars BETWEEN {_GOOD_LO} AND {_GOOD_HI}
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_good
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
                   CAST(SUM(n_good) AS BIGINT) AS gg
            FROM per
        )
        SELECT source, n_docs, n_good,
               {duck_int_ratio('(SELECT gg FROM tot)', '(SELECT nn FROM tot)', 6)} AS m_all_e6,
               {duck_int_ratio('((SELECT gg FROM tot) - n_good)',
                               '((SELECT nn FROM tot) - n_docs)', 6)} AS m_without_e6,
               {duck_int_ratio('(SELECT gg FROM tot)', '(SELECT nn FROM tot)', 6)}
                 - {duck_int_ratio('((SELECT gg FROM tot) - n_good)',
                                   '((SELECT nn FROM tot) - n_docs)', 6)} AS contribution_e6
        FROM per
    """,
    tags=("data-valuation", "loo", "documents", "corpus"),
)
def source_loo_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out source valuation: the corpus metric is the share of
    documents in the 200–2000-char 'good' band; a source's contribution
    is the metric WITH the corpus minus the metric WITHOUT that source.
    Positive contribution = the source lifts corpus quality; negative =
    cutting it would improve the mix. One aggregate pass: per-source
    counts plus grand totals give every LOO metric by subtraction — the
    'one scan, k counterfactuals' trick that makes LOO free at 100 TB
    (a naive per-source rescan would be |sources| full passes).

    Assumes >1 source (LOO denominator nn − n_docs > 0), which the
    corpus mixing tier guarantees."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(
                F.col("n_chars").between(_GOOD_LO, _GOOD_HI), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_good"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("nn"),
        F.sum("n_good").cast("bigint").alias("gg"),
    )
    m_all = int_ratio(F.col("gg"), F.col("nn"), 6)
    m_wo = int_ratio(F.col("gg") - F.col("n_good"), F.col("nn") - F.col("n_docs"), 6)
    return (
        per.crossJoin(F.broadcast(tot))  # 1-row grand aggregate (BNLJ-exempt)
        .select(
            "source",
            "n_docs",
            "n_good",
            m_all.alias("m_all_e6"),
            m_wo.alias("m_without_e6"),
            (m_all - m_wo).alias("contribution_e6"),
        )
    )


_K_FOLDS = 5

_DUCK_FOLD = (
    "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS BIGINT) % 5"
)


def _fold(col):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("bigint") % _K_FOLDS
    )


@register(
    "kfold_cv_mae",
    oracle=f"""
        WITH o AS (
            SELECT {_DUCK_FOLD} AS fold,
                   c.c_mktsegment AS seg,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM orders JOIN customer c ON o_custkey = c_custkey
        ),
        sf AS (
            SELECT seg, fold,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   COUNT(*) AS n
            FROM o GROUP BY seg, fold
        ),
        st AS (
            SELECT seg,
                   CAST(SUM(s) AS BIGINT) AS s_all,
                   CAST(SUM(n) AS BIGINT) AS n_all
            FROM sf GROUP BY seg
        ),
        pred AS (
            SELECT sf.seg, sf.fold,
                   {duck_int_ratio('(st.s_all - sf.s)', '(st.n_all - sf.n)', 0)} AS pred_cents
            FROM sf JOIN st USING (seg)
        ),
        scored AS (
            SELECT o.fold, ABS(o.cents - p.pred_cents) AS err
            FROM o JOIN pred p ON o.seg = p.seg AND o.fold = p.fold
        )
        SELECT CAST(fold AS BIGINT) AS fold,
               COUNT(*) AS n_test,
               {duck_int_ratio('CAST(SUM(err) AS BIGINT)', 'COUNT(*)', 2)} AS mae_cents_e2
        FROM scored
        GROUP BY fold
    """,
    tags=("ml-eval", "cross-validation", "orders", "customer"),
)
def kfold_cv_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated MAE of the segment-mean price model, from
    ONE aggregate pass: the (segment × fold) sum/count table yields every
    fold's TRAINING statistics by subtracting its own cell from the
    segment total (train = all − held-out), so no fold ever rescans the
    fact table. Each held-out order then scores |actual − pred| against
    its fold's prediction, rolled up to per-fold MAE in half-up cents.
    The spread across the 5 MAE rows is the model-stability estimate CV
    exists for; the fold split is the deterministic md5 bucket rule.

    Scale design: two fact-sized hash shuffles total (the seg×fold
    aggregate, the score rollup) regardless of k — the classic
    sufficient-statistics formulation of linear-family CV; predictions
    are a |segments|×k broadcast relation."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o = orders.join(
        customer.select(
            F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("seg")
        ),
        "o_custkey",
    ).select(
        _fold(F.col("o_orderkey")).alias("fold"),
        "seg",
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    sf = o.groupBy("seg", "fold").agg(
        F.sum("cents").cast("bigint").alias("s"), F.count("*").alias("n")
    )
    st = sf.groupBy("seg").agg(
        F.sum("s").cast("bigint").alias("s_all"), F.sum("n").cast("bigint").alias("n_all")
    )
    pred = sf.join(st, "seg").select(
        "seg",
        "fold",
        int_ratio(F.col("s_all") - F.col("s"), F.col("n_all") - F.col("n"), 0).alias(
            "pred_cents"
        ),
    )
    scored = o.join(F.broadcast(pred), ["seg", "fold"]).select(
        "fold", F.abs(F.col("cents") - F.col("pred_cents")).alias("err")
    )
    return scored.groupBy("fold").agg(
        F.count("*").alias("n_test"),
        int_ratio(F.sum("err"), F.count("*"), 2).alias("mae_cents_e2"),
    )
