"""Pipeline batch 104 (round 4): POPULATION / COVERAGE ESTIMATION — two
classical "how much haven't we seen" estimators, the statistical
complement of the sketch tier's "how much have we seen":

* ``capture_recapture_users`` — Lincoln-Petersen / Chapman mark-
  recapture estimate of the total user population from two overlapping
  observation windows (weekday-active vs weekend-active users): the
  method a pipeline uses to estimate true audience size when every
  source undercounts. All-integer inputs; both the classic and the
  bias-corrected Chapman estimator on the exact grid.
* ``vocab_coverage_chao1`` — Good-Turing unseen-probability mass
  (P₀ = f₁/N) and the Chao1 species-richness estimate
  (Ŝ = S + f₁²/(2f₂)) from the corpus token frequency-of-frequencies —
  the estimators that answer "how much vocabulary does the corpus NOT
  cover yet", i.e. whether more data would still grow the vocab (the
  sampling-curve complement of ``heaps_law_vocab_growth``).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
estimation tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import duck_int_ratio, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DUCK_WEEKEND = "(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) IN (2, 3)"


@register(
    "capture_recapture_users",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   MAX(CASE WHEN {_DUCK_WEEKEND} THEN 0 ELSE 1 END) AS wd,
                   MAX(CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END) AS we
            FROM events GROUP BY user_id
        ),
        c AS (
            SELECT CAST(SUM(wd) AS BIGINT) AS n1,
                   CAST(SUM(we) AS BIGINT) AS n2,
                   CAST(SUM(wd * we) AS BIGINT) AS m,
                   CAST(COUNT(*) AS BIGINT) AS n_observed
            FROM u
        )
        SELECT n1, n2, m, n_observed,
               {duck_int_ratio("n1 * n2", "m", 0)} AS lincoln_petersen_est,
               CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman_est
        FROM c
    """,
    tags=("estimation", "capture-recapture", "events"),
)
def capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark-recapture estimate of the true user population from two
    overlapping observation windows: capture 1 = users seen on weekdays
    (n1), capture 2 = users seen on weekends (n2), recaptures m = users
    seen in both. Lincoln-Petersen N̂ = n1·n2/m (exact half-up integer
    ratio) and the bias-corrected Chapman estimator
    (n1+1)(n2+1)/(m+1) − 1 (exact floor division, identical both
    engines). Under independent captures N̂ ≥ the observed union — the
    gap estimates the never-seen population, which is how audience
    total, crawl coverage, or entity-dedup completeness is estimated
    from overlapping partial sources.

    Scale design: one fact scan folds to per-user capture flags, then a
    grand aggregate — two integers of state per user at the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    weekend = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) % 7
    ).isin(2, 3)
    u = ev.groupBy("user_id").agg(
        F.max(F.when(weekend, 0).otherwise(1)).alias("wd"),
        F.max(F.when(weekend, 1).otherwise(0)).alias("we"),
    )
    c = u.agg(
        F.sum("wd").cast("bigint").alias("n1"),
        F.sum("we").cast("bigint").alias("n2"),
        F.sum(F.col("wd") * F.col("we")).cast("bigint").alias("m"),
        F.count("*").cast("bigint").alias("n_observed"),
    )
    chapman = (
        F.call_function(
            "div",
            (F.col("n1") + 1) * (F.col("n2") + 1),
            (F.col("m") + 1).cast("bigint"),
        )
        - 1
    )
    return c.select(
        "n1",
        "n2",
        "m",
        "n_observed",
        int_ratio(F.col("n1") * F.col("n2"), F.col("m"), 0).alias(
            "lincoln_petersen_est"
        ),
        chapman.cast("bigint").alias("chapman_est"),
    )


@register(
    "vocab_coverage_chao1",
    oracle="""
        WITH toks AS (
            SELECT tok FROM documents,
                 UNNEST(list_filter(string_split_regex(text, '[ \t\r\n]'), t -> t <> '')) AS u(tok)
        ),
        wf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
        fof AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                   CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
            FROM wf
        )
        SELECT s_obs, n_tokens, f1, f2,
               CAST((f1 * 1000000 + n_tokens // 2) // n_tokens AS BIGINT) AS p0_unseen_e6,
               CAST(s_obs + FLOOR(CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
                    / (2.0 * CASE WHEN f2 = 0 THEN 1 ELSE f2 END) + 0.5) AS BIGINT) AS chao1_richness
        FROM fof
    """,
    tags=("estimation", "coverage", "good-turing", "documents"),
)
def vocab_coverage_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary coverage estimators from the frequency-of-
    frequencies: Good-Turing unseen mass P₀ = f₁/N (the probability the
    next token is a NEW type — exact half-up e6 ratio of singleton
    count to token count) and the Chao1 richness estimate
    Ŝ = S_obs + f₁²/(2·f₂) (products-in-double of exact integers,
    f₂=0 guarded to the bias-corrected denominator 1). Together they
    answer whether more data still grows the vocabulary — the
    decision input for corpus expansion next to the Heaps-law fit.

    Scale design: the wordcount shuffle then a grand aggregate over the
    vocabulary rollup; frequency-of-frequencies needs no second
    fact-table pass."""
    from multithreaded_map_reduce_library_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    fof = wf.agg(
        F.count("*").cast("bigint").alias("s_obs"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("bigint").alias("f2"),
    )
    f2safe = F.when(F.col("f2") == 0, F.lit(1)).otherwise(F.col("f2"))
    chao1 = F.col("s_obs") + F.floor(
        F.col("f1").cast("double") * F.col("f1").cast("double")
        / (2.0 * f2safe)
        + F.lit(0.5)
    )
    return fof.select(
        "s_obs",
        "n_tokens",
        "f1",
        "f2",
        int_ratio(F.col("f1"), F.col("n_tokens"), 6).alias("p0_unseen_e6"),
        chao1.cast("bigint").alias("chao1_richness"),
    )
