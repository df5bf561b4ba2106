"""Pipeline batch 102 (round 4): DECISION-STUMP FIT + CRAMÉR-VON MISES —
an exact tree-learning primitive and the missing member of the CDF-
distance drift family:

* ``decision_stump_quality`` — fit the optimal depth-1 decision tree
  (one threshold on ``n_chars`` predicting ``lang='en'``) by exact
  weighted Gini impurity over every candidate split: counts are exact
  integers, impurities are products-in-double of those integers on the
  e9 grid, and the argmin is deterministic (impurity, then threshold).
  The split-selection inner loop of CART/GBDT, as a registry query with
  the information-gain audit (root Gini − best split Gini).
* ``cramer_von_mises_drift`` — the two-sample Cramér-von Mises
  statistic between weekday and weekend purchase values:
  T = Σ_pooled (F1−F2)² · nm/N², evaluated at every distinct value with
  exact integer CDF cross-differences (cum1·m − cum2·n). KS takes the
  max CDF gap, EMD the L1 area, PSI the likelihood-weighted gap — CvM
  is the L2 member, most sensitive to mid-distribution shifts.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
statistics tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "decision_stump_quality",
    oracle="""
        WITH pts AS (
            SELECT n_chars AS x,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
            FROM documents
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
            FROM pts
        ),
        grp AS (
            SELECT x, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(pos) AS BIGINT) AS cp
            FROM pts GROUP BY x
        ),
        cum AS (
            SELECT x,
                   CAST(SUM(c) OVER (ORDER BY x) AS BIGINT) AS nl,
                   CAST(SUM(cp) OVER (ORDER BY x) AS BIGINT) AS pl
            FROM grp
        ),
        cand AS (
            SELECT x AS thr, nl, pl, n - nl AS nr, p - pl AS pr,
                   CAST(FLOOR((2.0 * pl * (nl - pl) / (CAST(nl AS DOUBLE) * n)
                             + 2.0 * (p - pl) * ((n - nl) - (p - pl))
                               / (CAST(n - nl AS DOUBLE) * n))
                        * 1000000000.0 + 0.5) AS BIGINT) AS split_gini_e9
            FROM cum CROSS JOIN tot
            WHERE nl < n
        ),
        best AS (
            SELECT * FROM cand ORDER BY split_gini_e9, thr LIMIT 1
        )
        SELECT b.thr AS best_threshold,
               b.nl AS n_left, b.pl AS pos_left,
               b.nr AS n_right, b.pr AS pos_right,
               b.split_gini_e9,
               CAST(FLOOR(2.0 * p * (n - p) / (CAST(n AS DOUBLE) * n)
                    * 1000000000.0 + 0.5) AS BIGINT) AS root_gini_e9,
               CAST(FLOOR(2.0 * p * (n - p) / (CAST(n AS DOUBLE) * n)
                    * 1000000000.0 + 0.5) AS BIGINT) - b.split_gini_e9 AS gain_e9
        FROM best b CROSS JOIN tot
    """,
    tags=("ml", "decision-tree", "gini", "documents", "global-sort"),
)
def decision_stump_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal depth-1 decision stump on n_chars predicting lang='en':
    every distinct feature value is a candidate threshold (left =
    x ≤ thr); the split's weighted Gini impurity
    2·pl·(nl−pl)/(nl·n) + 2·pr·(nr−pr)/(nr·n) is evaluated as
    products-in-double of exact integer counts on the e9 grid, and the
    argmin tie-breaks on the smaller threshold. Emits the chosen split,
    its leaf counts, and the Gini gain vs the root — CART's split
    selection as an auditable query.

    Scale design: one scan to the distinct-value rollup (bounded by the
    feature's domain), one ordered cumulative window on that rollup, a
    deterministic top-1. At 100 TB real learners bin features first
    (equi-depth histogram — the registry has one); the same cumulative
    trick then runs on ≤256 bins."""
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(
        F.col("n_chars").alias("x"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    tot = pts.agg(
        F.count("*").cast("bigint").alias("n"), F.sum("pos").cast("bigint").alias("p")
    )
    grp = pts.groupBy("x").agg(
        F.count("*").cast("bigint").alias("c"), F.sum("pos").cast("bigint").alias("cp")
    )
    wcum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = grp.select(
        "x",
        F.sum("c").over(wcum).cast("bigint").alias("nl"),
        F.sum("cp").over(wcum).cast("bigint").alias("pl"),
    )
    j = cum.crossJoin(F.broadcast(tot)).where(F.col("nl") < F.col("n"))
    nl, pl = F.col("nl").cast("double"), F.col("pl")
    nr = (F.col("n") - F.col("nl")).cast("double")
    pr = F.col("p") - F.col("pl")
    nd = F.col("n").cast("double")
    split_gini = (
        2.0 * pl * (F.col("nl") - pl) / (nl * nd)
        + 2.0 * pr * ((F.col("n") - F.col("nl")) - pr) / (nr * nd)
    )
    cand = j.select(
        F.col("x").alias("thr"),
        F.col("nl").alias("n_left"),
        F.col("pl").alias("pos_left"),
        (F.col("n") - F.col("nl")).alias("n_right"),
        pr.alias("pos_right"),
        F.floor(split_gini * 1000000000.0 + F.lit(0.5)).cast("bigint").alias(
            "split_gini_e9"
        ),
    )
    wbest = Window.orderBy("split_gini_e9", "thr")
    best = cand.withColumn("rnb", F.row_number().over(wbest)).where(F.col("rnb") == 1)
    root_gini = F.floor(
        2.0
        * F.col("p")
        * (F.col("n") - F.col("p"))
        / (F.col("n").cast("double") * F.col("n"))
        * 1000000000.0
        + F.lit(0.5)
    ).cast("bigint")
    return best.crossJoin(F.broadcast(tot)).select(
        F.col("thr").alias("best_threshold"),
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        "split_gini_e9",
        root_gini.alias("root_gini_e9"),
        (root_gini - F.col("split_gini_e9")).cast("bigint").alias("gain_e9"),
    )


_DUCK_WEEKEND = "(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) IN (2, 3)"


@register(
    "cramer_von_mises_drift",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v,
                   CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS we
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
        ),
        grp AS (
            SELECT v,
                   CAST(SUM(1 - we) AS BIGINT) AS c1,
                   CAST(SUM(we) AS BIGINT) AS c2
            FROM pts GROUP BY v
        ),
        cum AS (
            SELECT v, c1, c2,
                   CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
                   CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS cum2,
                   CAST(SUM(c1) OVER () AS BIGINT) AS n,
                   CAST(SUM(c2) OVER () AS BIGINT) AS m
            FROM grp
        )
        SELECT MAX(n) AS n_weekday,
               MAX(m) AS n_weekend,
               CAST(SUM(FLOOR(
                   (c1 + c2)
                   * (CAST(cum1 * m - cum2 * n AS DOUBLE) * CAST(cum1 * m - cum2 * n AS DOUBLE))
                   / (CAST(n AS DOUBLE) * m * (n + m) * (n + m))
                   * 1000000000.0 + 0.5)) AS BIGINT) AS cvm_t_e9
        FROM cum
    """,
    tags=("statistics", "drift", "cramer-von-mises", "events", "global-sort"),
)
def cramer_von_mises_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between weekday and weekend
    purchase values: T = (nm/N²)·Σ_pooled (F1−F2)², evaluated per
    distinct value as (c1+c2)·d²/(nm·N²) with the exact integer CDF
    cross-difference d = cum1·m − cum2·n (ties handled by evaluating at
    distinct values with multiplicity — the standard discrete form).
    Each term is an e9-grid integer; squares are products in double of
    int64-exact quantities. The L2 CDF-distance member completing KS
    (max gap), EMD (L1 area), and PSI (likelihood-weighted).

    Scale design: identical to the KS/EMD queries — one scan to the
    distinct-value rollup, cumulative windows on that rollup only."""
    ev = load_table(spark, sf_dir, "events")
    weekend = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) % 7
    ).isin(2, 3)
    pts = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint").alias("v"),
        F.when(weekend, 1).otherwise(0).alias("we"),
    )
    grp = pts.groupBy("v").agg(
        F.sum(1 - F.col("we")).cast("bigint").alias("c1"),
        F.sum("we").cast("bigint").alias("c2"),
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = grp.select(
        "c1",
        "c2",
        F.sum("c1").over(wcum).cast("bigint").alias("cum1"),
        F.sum("c2").over(wcum).cast("bigint").alias("cum2"),
        F.sum("c1").over(wall).cast("bigint").alias("n"),
        F.sum("c2").over(wall).cast("bigint").alias("m"),
    )
    d = (F.col("cum1") * F.col("m") - F.col("cum2") * F.col("n")).cast("double")
    term = F.floor(
        (F.col("c1") + F.col("c2"))
        * (d * d)
        / (
            F.col("n").cast("double")
            * F.col("m")
            * (F.col("n") + F.col("m"))
            * (F.col("n") + F.col("m"))
        )
        * 1000000000.0
        + F.lit(0.5)
    )
    return cum.agg(
        F.max("n").alias("n_weekday"),
        F.max("m").alias("n_weekend"),
        F.sum(term).cast("bigint").alias("cvm_t_e9"),
    )
