"""Pipeline batch 113 (round 4): SURVIVAL EVALUATION — Harrell's
concordance index and the restricted mean survival time, completing
the survival tier (kaplan_meier_conversion, nelson_aalen_conversion):

* ``survival_concordance_index`` — the c-index of a risk score (the
  user's click count) against view→purchase conversion with
  right-censoring: comparable pairs are (i converted, j still at risk
  at t_i); doubled concordance counts (2·#(s_i>s_j) + #ties) keep the
  ½-credit convention exact in integers. The survival analogue of the
  AUC already registered (`classifier_auc_exact`).
* ``rmst_conversion`` — restricted mean survival time through a 240 h
  horizon: the exact stepwise integral of the KM curve (same risk-set
  CTEs as pipeline54), Σ S(t_k)·Δt with the e6-quantized survival
  values times exact hour gaps — all integers after the KM quantize.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no survival tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import duck_int_ratio, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_TAU_H = 240
#: Constant cap on the click-count risk score: scores above the cap are
#: treated as tied at the cap (bot-range clicks carry no extra rank
#: information), which bounds the score axis of the c-index grid at a
#: corpus-independent 4097 values.  Applied identically in the Spark
#: plan, the DuckDB oracle and the pairwise replay test.
_SCORE_CAP = 4096

_DUCK_OBS = f"""
        f AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy,
                   LEAST(CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT), {_SCORE_CAP}) AS score
            FROM events GROUP BY user_id
        ),
        g AS (SELECT MAX(ts) AS t_end FROM events),
        obs AS (
            SELECT f.user_id, f.score,
                   CASE WHEN t_buy IS NOT NULL AND t_buy > t_view
                        THEN CAST(FLOOR(epoch(t_buy - t_view) / 3600) AS BIGINT)
                        ELSE CAST(FLOOR(epoch(g.t_end - t_view) / 3600) AS BIGINT)
                   END AS t_hours,
                   CASE WHEN t_buy IS NOT NULL AND t_buy > t_view
                        THEN 1 ELSE 0 END AS converted
            FROM f CROSS JOIN g
            WHERE t_view IS NOT NULL
        )
"""


@register(
    "survival_concordance_index",
    oracle=f"""
        WITH {_DUCK_OBS},
        pairs AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_comparable,
                   CAST(SUM(CASE WHEN i.score > j.score THEN 2
                                 WHEN i.score = j.score THEN 1
                                 ELSE 0 END) AS BIGINT) AS conc2
            FROM obs i JOIN obs j
              ON i.user_id <> j.user_id
             AND i.converted = 1
             AND (j.t_hours > i.t_hours
                  OR (j.t_hours = i.t_hours AND j.converted = 0))
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM obs)
        SELECT nn.n_users, pairs.n_comparable, pairs.conc2,
               {duck_int_ratio("pairs.conc2", "2 * pairs.n_comparable", 6)}
                   AS c_index_e6
        FROM pairs CROSS JOIN nn
    """,
    tags=("statistics", "survival", "c-index", "events", "rank-sweep"),
    bench=True,
)
def survival_concordance_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harrell's c-index of the click-count risk score for
    view→purchase conversion: over comparable pairs (i converted while
    j was still at risk — j's observed time exceeds i's event time, or
    equals it with j censored), count 2 for a concordant score order
    (higher score converts sooner), 1 for a score tie; the index is the
    exact half-up ratio conc2 / (2·comparable). A c-index of 0.5 is an
    uninformative score; the AUC twin for time-to-event data.

    The risk score is the click count clamped at a constant
    ``_SCORE_CAP`` (4096): clicks beyond the cap carry no extra rank
    information (bot territory), and the clamp — applied identically in
    the Spark plan, the DuckDB oracle and the pairwise replay test — is
    what bounds the grid's score axis independently of the corpus.

    Scale design (round-5 rewrite, VERDICT r4 item 1; axis bounded in
    round 6 per VERDICT r5 item 1): no pair join at any cardinality.
    Users collapse to (t_hours, score) cells in one shuffle; the grid is
    the cross of the *distinct* event-hours with the *distinct* clamped
    scores (≤ 4097 values by the cap — never a data-dependent dense
    ``sequence(0, max(score))``; scores absent from the corpus
    contribute zero to every window sum, so the sparse axis is exactly
    value-preserving). The score axis ships as a one-row
    ``collect_set`` broadcast exploded per time row — a scalar build
    side, plan-audit-clean without an allowlist entry. Two partitioned
    cumulative windows then read every pair class off the grid exactly:

      * per score, a time-cumulative sum gives ``suf_gt(t, s)`` — users
        with that score observed strictly after t;
      * per time, a score-prefix sum over (suf_gt, censored-at-t counts)
        gives the concordant (score strictly lower) and tied risk-set
        masses for every converted cell.

    ``conc2 = Σ n_conv(t,s)·(2·lower + ties)`` and ``n_comparable =
    Σ n_conv(t,s)·|risk set(t)|`` are grand sums over the grid. Cost is
    O(T·S) with S ≤ 4097 by the constant cap and T the distinct
    event-hours (calendar-bounded) — no corpus-data-dependent axis
    width remains in the plan — vs the |users|² pair join that the
    DuckDB oracle keeps as the semantic contract. The pairwise replay
    in tests/test_round4d_operators.py pins equality."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
        F.least(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast(
                "bigint"
            ),
            F.lit(_SCORE_CAP),
        ).alias("score"),
    )
    g = ev.agg(F.max("ts").alias("t_end"))
    conv = F.col("t_buy").isNotNull() & (F.col("t_buy") > F.col("t_view"))
    obs = (
        f.where(F.col("t_view").isNotNull())
        .crossJoin(F.broadcast(g))
        .select(
            "user_id",
            "score",
            F.when(
                conv,
                F.floor(
                    (F.unix_timestamp("t_buy") - F.unix_timestamp("t_view")) / 3600
                ).cast("bigint"),
            )
            .otherwise(
                F.floor(
                    (F.unix_timestamp("t_end") - F.unix_timestamp("t_view")) / 3600
                ).cast("bigint")
            )
            .alias("t_hours"),
            F.when(conv, 1).otherwise(0).alias("converted"),
        )
    )
    cells = obs.groupBy("t_hours", "score").agg(
        F.count("*").alias("n_any"), F.sum("converted").alias("n_conv")
    )
    times = cells.select("t_hours").distinct()
    # one-row array of the distinct clamped scores (≤ 4097 elements by
    # _SCORE_CAP): a scalar broadcast build side, exploded per time row
    scores = cells.agg(F.collect_set("score").alias("score_axis"))
    grid = times.crossJoin(F.broadcast(scores)).select(
        "t_hours", F.explode("score_axis").alias("score")
    )
    g = grid.join(cells, ["t_hours", "score"], "left").select(
        "t_hours",
        "score",
        F.coalesce("n_any", F.lit(0)).alias("n_any"),
        F.coalesce("n_conv", F.lit(0)).alias("n_conv"),
        (F.coalesce("n_any", F.lit(0)) - F.coalesce("n_conv", F.lit(0))).alias(
            "n_cens"
        ),
    )
    w_tot = Window.partitionBy("score")
    w_cum = (
        Window.partitionBy("score")
        .orderBy("t_hours")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g2 = g.select(
        "t_hours",
        "score",
        "n_conv",
        "n_cens",
        (F.sum("n_any").over(w_tot) - F.sum("n_any").over(w_cum)).alias("suf_gt"),
    )
    w_slt = (
        Window.partitionBy("t_hours")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tall = Window.partitionBy("t_hours")
    g3 = g2.select(
        "n_conv",
        "n_cens",
        "suf_gt",
        F.coalesce(F.sum("suf_gt").over(w_slt), F.lit(0)).alias("lt_suf"),
        F.coalesce(F.sum("n_cens").over(w_slt), F.lit(0)).alias("lt_cens"),
        (F.sum("suf_gt").over(w_tall) + F.sum("n_cens").over(w_tall)).alias(
            "risk_n"
        ),
    )
    pairs = g3.where(F.col("n_conv") > 0).agg(
        F.sum(F.col("n_conv") * F.col("risk_n")).cast("bigint").alias("n_comparable"),
        F.sum(
            F.col("n_conv")
            * (
                2 * (F.col("lt_suf") + F.col("lt_cens"))
                + F.col("suf_gt")
                + F.col("n_cens")
            )
        )
        .cast("bigint")
        .alias("conc2"),
    )
    nn = obs.agg(F.count("*").cast("bigint").alias("n_users"))
    return pairs.crossJoin(F.broadcast(nn)).select(
        "n_users",
        "n_comparable",
        "conc2",
        int_ratio(F.col("conc2"), 2 * F.col("n_comparable"), 6).alias("c_index_e6"),
    )


@register(
    "rmst_conversion",
    oracle=f"""
        WITH {_DUCK_OBS},
        n_all AS (SELECT COUNT(*) AS n0 FROM obs),
        ev2 AS (
            SELECT t_hours, SUM(converted) AS d, COUNT(*) AS leaving
            FROM obs GROUP BY t_hours
        ),
        risk AS (
            SELECT t_hours, d,
                   n_all.n0
                   - COALESCE(SUM(leaving) OVER (ORDER BY t_hours ASC
                                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND 1 PRECEDING), 0) AS n_risk
            FROM ev2 CROSS JOIN n_all
        ),
        steps AS (
            SELECT t_hours, d, n_risk,
                   CAST(FLOOR(ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                              * 1000000.0 + 0.5) AS BIGINT) AS lq
            FROM risk WHERE d > 0 AND n_risk > d
        ),
        km AS (
            SELECT t_hours,
                   CAST(FLOOR(exp(CAST(SUM(lq) OVER (ORDER BY t_hours ASC
                                                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                             / 1000000.0) * 1000000.0 + 0.5) AS BIGINT) AS s_e6
            FROM steps
            WHERE t_hours < {_TAU_H}
        ),
        segs AS (
            SELECT s_e6,
                   LEAST(COALESCE(LEAD(t_hours) OVER (ORDER BY t_hours), {_TAU_H}),
                         {_TAU_H}) - t_hours AS dt,
                   MIN(t_hours) OVER () AS t_first
            FROM km
        ),
        parts AS (
            SELECT CAST(SUM(s_e6 * dt) AS BIGINT) AS tail,
                   CAST(MAX(t_first) AS BIGINT) AS head
            FROM segs
        )
        SELECT CAST({_TAU_H} AS BIGINT) AS horizon_h,
               (SELECT CAST(n0 AS BIGINT) FROM n_all) AS n_users,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM km) AS n_steps,
               CAST(COALESCE(parts.head, {_TAU_H}) * 1000000
                    + COALESCE(parts.tail, 0) AS BIGINT) AS rmst_e6_hours
        FROM parts
    """,
    tags=("statistics", "survival", "rmst", "events", "global-sort"),
)
def rmst_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time through a 240 h horizon: the
    stepwise-exact integral of the KM curve (risk-set construction of
    pipeline54) — S = 1 on [0, t_first), then each quantized survival
    level times its exact hour gap, segments clipped at the horizon.
    After the KM quantize every term is an integer, so the area is
    exact and cross-engine identical. RMST is the "expected conversion-
    free hours in the first 10 days" number a growth team reads off
    the curve.

    Scale design: identical to KM — windows on the |distinct event
    hours| rollup only; the integral adds one LEAD and one sum on that
    same skinny relation."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    g = ev.agg(F.max("ts").alias("t_end"))
    conv = F.col("t_buy").isNotNull() & (F.col("t_buy") > F.col("t_view"))
    obs = (
        f.where(F.col("t_view").isNotNull())
        .crossJoin(F.broadcast(g))
        .select(
            F.when(
                conv,
                F.floor(
                    (F.unix_timestamp("t_buy") - F.unix_timestamp("t_view")) / 3600
                ).cast("bigint"),
            )
            .otherwise(
                F.floor(
                    (F.unix_timestamp("t_end") - F.unix_timestamp("t_view")) / 3600
                ).cast("bigint")
            )
            .alias("t_hours"),
            F.when(conv, 1).otherwise(0).alias("converted"),
        )
    )
    n_all = obs.agg(F.count("*").alias("n0"))
    ev2 = obs.groupBy("t_hours").agg(
        F.sum("converted").alias("d"), F.count("*").alias("leaving")
    )
    w_prev = Window.orderBy(F.asc("t_hours")).rowsBetween(Window.unboundedPreceding, -1)
    risk = ev2.crossJoin(F.broadcast(n_all)).select(
        "t_hours",
        "d",
        (F.col("n0") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))).alias(
            "n_risk"
        ),
    )
    steps = risk.where((F.col("d") > 0) & (F.col("n_risk") > F.col("d"))).select(
        "t_hours",
        F.floor(
            F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk"))
            * 1000000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lq"),
    )
    w_cum = Window.orderBy(F.asc("t_hours")).rowsBetween(Window.unboundedPreceding, 0)
    km = steps.where(F.col("t_hours") < _TAU_H).select(
        "t_hours",
        F.floor(
            F.exp(F.sum("lq").over(w_cum).cast("double") / 1000000.0) * 1000000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("s_e6"),
    )
    wlead = Window.orderBy("t_hours")
    wall = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    segs = km.select(
        "s_e6",
        (
            F.least(
                F.coalesce(F.lead("t_hours").over(wlead), F.lit(_TAU_H)), F.lit(_TAU_H)
            )
            - F.col("t_hours")
        ).alias("dt"),
        F.min("t_hours").over(wall).alias("t_first"),
    )
    parts = segs.agg(
        F.sum(F.col("s_e6") * F.col("dt")).cast("bigint").alias("tail"),
        F.max("t_first").cast("bigint").alias("head"),
        F.count("*").cast("bigint").alias("n_steps"),
    )
    return parts.crossJoin(F.broadcast(n_all)).select(
        F.lit(_TAU_H).cast("bigint").alias("horizon_h"),
        F.col("n0").cast("bigint").alias("n_users"),
        "n_steps",
        (
            F.coalesce(F.col("head"), F.lit(_TAU_H)) * 1000000
            + F.coalesce(F.col("tail"), F.lit(0))
        )
        .cast("bigint")
        .alias("rmst_e6_hours"),
    )
