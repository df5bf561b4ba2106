"""Pipeline batch 80 (round 4): CONFORMAL COVERAGE AUDIT + IPS OFF-POLICY
EVALUATION — two modern ML-evaluation primitives over the warehouse
tables.

* ``conformal_coverage_audit`` — split-conformal prediction: calibrate a
  residual quantile q̂ on a held-out calibration split (deterministic md5
  hash split, the repo's sampling rule), then audit the conformal
  interval's empirical coverage on the test split, per order priority.
  The marginal guarantee (coverage ≥ 1−α in expectation) is the property
  a model-serving gate checks before trusting intervals in production.
* ``ips_policy_value`` — inverse-propensity-scoring estimate of a
  counterfactual policy's value from logged interaction data: propensities
  are the logged empirical action rates per context segment, the target
  policy always plays 'click', and the estimator Σ 1[a=click]·r/p̂ is
  evaluated as exact per-segment rational arithmetic (the per-segment sum
  collapses every IPS term to one integer ratio).

Both stay all-integer end to end: money in cents, the conformal quantile
as a k-th smallest integer residual, IPS as quotient/remainder grids.
Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
evaluation tier; these extend the driver-mandated training-data superset.
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

_CAL_PCT = 50  # md5 bucket < 50 of 100 → calibration split
_ALPHA_PCT = 10  # 1-α = 90% target coverage

#: md5 split bucket in [0,100) of the order key — corpus.py sampling rule
_DUCK_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS BIGINT) % 100"
)


def _bucket(col):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("bigint")
        % 100
    )


@register(
    "conformal_coverage_audit",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
                   c.c_mktsegment AS seg,
                   {_DUCK_BUCKET} AS bkt
            FROM orders JOIN customer c ON o_custkey = c_custkey
        ),
        segstat AS (
            SELECT seg,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   COUNT(*) AS n
            FROM o WHERE bkt < {_CAL_PCT}
            GROUP BY seg
        ),
        pred AS (
            SELECT seg, {duck_int_ratio('s', 'n', 0)} AS pred_cents FROM segstat
        ),
        calib AS (
            SELECT ABS(o.cents - p.pred_cents) AS score
            FROM o JOIN pred p USING (seg)
            WHERE o.bkt < {_CAL_PCT}
        ),
        ncal AS (SELECT COUNT(*) AS n FROM calib),
        ranked AS (
            SELECT score, ROW_NUMBER() OVER (ORDER BY score) AS rk FROM calib
        ),
        qhat AS (
            SELECT MIN(score) AS q FROM ranked
            WHERE rk >= CAST(CEIL((SELECT n + 1 FROM ncal) * {100 - _ALPHA_PCT} / 100.0) AS BIGINT)
        ),
        test AS (
            SELECT o.o_orderpriority,
                   CASE WHEN ABS(o.cents - p.pred_cents) <= (SELECT q FROM qhat)
                        THEN 1 ELSE 0 END AS covered
            FROM o JOIN pred p USING (seg)
            WHERE o.bkt >= {_CAL_PCT}
        )
        SELECT o_orderpriority,
               COUNT(*) AS n_test,
               CAST(SUM(covered) AS BIGINT) AS n_covered,
               CAST((SELECT q FROM qhat) AS BIGINT) AS qhat_cents,
               {duck_int_ratio('CAST(SUM(covered) AS BIGINT)', 'COUNT(*)', 6)} AS coverage_e6
        FROM test
        GROUP BY o_orderpriority
    """,
    tags=("ml-eval", "conformal", "orders", "customer", "calibration"),
    bench=True,
)
def conformal_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal coverage audit: the 'model' predicts an order's
    total as its market segment's calibration-split mean (half-up integer
    cents), the nonconformity score is the absolute residual, q̂ is the
    ⌈(n+1)(1−α)⌉-th smallest calibration score (α=0.1), and the output is
    the test split's per-priority empirical coverage of the interval
    pred ± q̂. Split-conformal's marginal guarantee says coverage ≈ 90%
    regardless of the model — the property this audit verifies before
    intervals gate decisions.

    Scale design: the segment stats and q̂ are tiny broadcast relations;
    both fact passes are scan + hash join + aggregate. The calibration
    quantile sorts only the calibration split's score column — at 100 TB
    that single-column sort is the one global stage, and it can fall back
    to approx_percentile with a documented tolerance. md5-bucket
    splitting is deterministic, so the audit is reproducible."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o = (
        orders.join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "o_custkey",
        )
        .select(
            "o_orderpriority",
            "seg",
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            _bucket(F.col("o_orderkey")).alias("bkt"),
        )
    )
    cal = o.where(F.col("bkt") < _CAL_PCT)
    segstat = cal.groupBy("seg").agg(
        F.sum("cents").cast("bigint").alias("s"), F.count("*").alias("n")
    )
    pred = segstat.select(
        "seg", int_ratio(F.col("s"), F.col("n"), 0).alias("pred_cents")
    )
    calib = cal.join(F.broadcast(pred), "seg").select(
        F.abs(F.col("cents") - F.col("pred_cents")).alias("score")
    )
    # q̂ = k-th smallest calibration score, k = ⌈(n+1)(1−α)⌉, computed from
    # the SCORE HISTOGRAM instead of a global row_number over every
    # calibration row (round-4 form): rank of a score value's last
    # occurrence is the cumulative count, so the k-th order statistic is
    # the smallest value whose running count reaches k — identical by
    # definition. The single-partition stage now sorts |distinct scores|
    # aggregated (score, count) pairs instead of the whole calibration
    # split with an n column cross-joined onto every row (guide §2.3:
    # aggregate before the global sort; at 100 TB this is the difference
    # between a corpus-sized global sort and a bounded-histogram one).
    hist = calib.groupBy("score").agg(F.count("*").alias("c"))
    ncal = hist.agg(F.sum("c").alias("n"))
    cum = hist.select(
        "score",
        F.sum("c")
        .over(Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    qhat = (
        cum.crossJoin(F.broadcast(ncal))
        .where(
            F.col("cum")
            >= F.ceil((F.col("n") + 1) * F.lit(100 - _ALPHA_PCT) / F.lit(100.0)).cast(
                "bigint"
            )
        )
        .agg(F.min("score").alias("q"))
    )
    test = (
        o.where(F.col("bkt") >= _CAL_PCT)
        .join(F.broadcast(pred), "seg")
        .crossJoin(F.broadcast(qhat))  # 1-row grand aggregate (BNLJ-exempt)
        .select(
            "o_orderpriority",
            "q",
            F.when(
                F.abs(F.col("cents") - F.col("pred_cents")) <= F.col("q"), 1
            )
            .otherwise(0)
            .alias("covered"),
        )
    )
    return test.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_test"),
        F.sum("covered").cast("bigint").alias("n_covered"),
        F.max("q").cast("bigint").alias("qhat_cents"),
        int_ratio(F.sum("covered"), F.count("*"), 6).alias("coverage_e6"),
    )


_TARGET_ACTION = "click"
_N_SEGMENTS = 10


@register(
    "ips_policy_value",
    oracle=f"""
        WITH logged AS (
            SELECT user_id % {_N_SEGMENTS} AS seg,
                   event_type AS action,
                   CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events
            WHERE value IS NOT NULL
        ),
        segstat AS (
            SELECT seg,
                   COUNT(*) AS n_seg,
                   CAST(SUM(CASE WHEN action = '{_TARGET_ACTION}' THEN 1 ELSE 0 END) AS BIGINT) AS n_target,
                   CAST(SUM(CASE WHEN action = '{_TARGET_ACTION}' THEN cents ELSE 0 END) AS BIGINT) AS target_cents
            FROM logged
            GROUP BY seg
            HAVING SUM(CASE WHEN action = 'click' THEN 1 ELSE 0 END) > 0
        ),
        tot AS (SELECT CAST(SUM(n_seg) AS BIGINT) AS n_total FROM segstat)
        SELECT seg, n_seg, n_target, target_cents,
               {duck_int_ratio('n_seg', 'n_target', 6)} AS ips_weight_e6,
               {duck_int_ratio_big('target_cents * n_seg', 'n_target * (SELECT n_total FROM tot)', 2)} AS ips_term_e2
        FROM segstat
    """,
    tags=("ml-eval", "ips", "off-policy", "events", "counterfactual"),
)
def ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity off-policy evaluation: logged bandit data is
    (context = user_id mod 10, action = event_type, reward = value in
    cents); the target policy deterministically plays 'click'. The IPS
    estimator (1/N)·Σ 1[aᵢ=click]·rᵢ/p̂(click|xᵢ), with p̂ the logged
    per-segment click rate, collapses per segment to one exact ratio —
    target_cents·n_seg / (n_target·N) — so the whole counterfactual
    estimate is integer-rational: each row is a segment's IPS weight
    (e6 grid) and its contribution to the estimated per-event reward of
    the target policy in cents (e2 grid, overflow-safe split). Summing
    ips_term_e2 across rows reproduces the full IPS value.

    Scale design: one groupBy(segment) over the fact scan — propensities
    and the estimator come from the same aggregate, so IPS costs exactly
    one shuffle at any scale; the 1-row total joins back broadcast."""
    ev = load_table(spark, sf_dir, "events")
    logged = ev.where(F.col("value").isNotNull()).select(
        (F.col("user_id") % _N_SEGMENTS).alias("seg"),
        F.col("event_type").alias("action"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    segstat = logged.groupBy("seg").agg(
        F.count("*").alias("n_seg"),
        F.sum(F.when(F.col("action") == _TARGET_ACTION, 1).otherwise(0))
        .cast("bigint")
        .alias("n_target"),
        F.sum(F.when(F.col("action") == _TARGET_ACTION, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("target_cents"),
    ).where(F.col("n_target") > 0)  # zero-propensity contexts: IPS undefined

    tot = segstat.agg(F.sum("n_seg").cast("bigint").alias("n_total"))
    return (
        segstat.crossJoin(F.broadcast(tot))  # 1-row grand aggregate (BNLJ-exempt)
        .select(
            "seg",
            "n_seg",
            "n_target",
            "target_cents",
            int_ratio(F.col("n_seg"), F.col("n_target"), 6).alias("ips_weight_e6"),
            int_ratio_big(
                F.col("target_cents") * F.col("n_seg"),
                F.col("n_target") * F.col("n_total"),
                2,
            ).alias("ips_term_e2"),
        )
    )
