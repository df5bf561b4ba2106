"""Pipeline batch 101 (round 4): ALGORITHMIC MARKETING ATTRIBUTION — the
two model-based attribution methods beyond the registry's heuristic ones
(linear and position-based in ``plans/corpus.py`` family):

* ``markov_removal_attribution`` — first-order Markov-chain attribution:
  build the user-journey transition matrix (START → event types →
  CONV/NULL absorbing states), compute the 12-step truncated conversion
  reachability from START, then for each channel redirect its inbound
  transitions to NULL and measure the drop — the REMOVAL EFFECT, the
  standard Markov attribution statistic. One unrolled value iteration
  covers all variants at once (states are keyed by variant).
* ``shapley_channel_attribution`` — cooperative-game attribution: the
  exact Shapley value of each of the 4 channels, with the coalition
  value v(S) = conversion rate of users whose channel set ⊆ S. With 4
  channels all 16 coalitions enumerate exactly; factorial weights are
  scaled by 4! = 24 and coalition values by e9, so the output is an
  exact integer combination of exact integer ratios.

Both are deterministic, integer-auditable formulations of methods that
are usually Monte Carlo — the same exact-replay discipline as the
KNN-Shapley valuation (pipeline94).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
attribution tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import duck_int_ratio, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_MKV_ROUNDS = 12
_CHANNELS = ("click", "error", "signup", "view")  # alphabetical; purchase = CONV


def _mkv_oracle() -> str:
    variants_sql = ", ".join(f"('rm_{c}', '{c}')" for c in _CHANNELS)
    rounds = []
    prev = "v0"
    for t in range(1, _MKV_ROUNDS + 1):
        # the absorbing CONV state has no outgoing edges, so the relax
        # step's GROUP BY would drop it — re-inject it at value 1 each
        # round or the iteration degrades to P(reach in EXACTLY k steps)
        rounds.append(
            f"""
        v{t} AS MATERIALIZED (
            SELECT t.variant, t.from_state AS state,
                   SUM(CAST(t.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE) * p.p) AS p
            FROM tv t JOIN {prev} p
              ON p.variant = t.variant AND p.state = t.to_state
            GROUP BY t.variant, t.from_state
            UNION ALL
            SELECT variant, state, p FROM {prev} WHERE state = 'purchase'
        )"""
        )
        prev = f"v{t}"
    return f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ),
        hops AS (
            SELECT user_id, event_type AS from_state,
                   LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
            FROM seq
        ),
        trans AS MATERIALIZED (
            SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
                SELECT 'START' AS from_state, event_type AS to_state
                FROM seq WHERE rn = 1
                UNION ALL
                SELECT CASE WHEN from_state = 'purchase' THEN NULL ELSE from_state END,
                       COALESCE(nxt, 'NULL')
                FROM hops
            ) WHERE from_state IS NOT NULL
            GROUP BY from_state, to_state
        ),
        variants(variant, removed) AS (VALUES ('full', ''), {variants_sql}),
        tv AS MATERIALIZED (
            SELECT v.variant, t.from_state,
                   CASE WHEN t.to_state = v.removed THEN 'NULL' ELSE t.to_state END AS to_state,
                   CAST(SUM(t.cnt) AS BIGINT) AS cnt,
                   CAST(SUM(SUM(t.cnt)) OVER (PARTITION BY v.variant, t.from_state) AS BIGINT) AS tot
            FROM trans t CROSS JOIN variants v
            WHERE t.from_state <> v.removed
            GROUP BY v.variant, t.from_state,
                     CASE WHEN t.to_state = v.removed THEN 'NULL' ELSE t.to_state END
        ),
        v0 AS MATERIALIZED (
            SELECT variant, state, CASE WHEN state = 'purchase' THEN 1.0 ELSE 0.0 END AS p
            FROM (SELECT DISTINCT v.variant, s.state
                  FROM variants v CROSS JOIN (
                      SELECT DISTINCT to_state AS state FROM trans
                      UNION SELECT DISTINCT from_state FROM trans
                  ) s)
        ),{",".join(rounds)},
        reach AS (
            SELECT variant, CAST(FLOOR(p * 1000000000.0 + 0.5) AS BIGINT) AS p_conv_e9
            FROM {prev} WHERE state = 'START'
        )
        SELECT r.variant, r.p_conv_e9,
               CASE WHEN r.variant = 'full' THEN CAST(0 AS BIGINT)
                    ELSE {duck_int_ratio("f.p_conv_e9 - r.p_conv_e9", "f.p_conv_e9", 6)}
               END AS removal_effect_e6
        FROM reach r CROSS JOIN (SELECT p_conv_e9 FROM reach WHERE variant = 'full') f
    """


@register(
    "markov_removal_attribution",
    oracle=_mkv_oracle(),
    tags=("attribution", "markov", "iterative", "events"),
)
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution: user journeys (ordered by
    ts, event_id) become a first-order transition matrix over START, the
    event types, and absorbing CONV (purchase reached) / NULL (journey
    end); conversion reachability from START is a 12-step truncated
    value iteration (purchase is absorbing at value 1 — transitions OUT
    of purchase are cut); each channel's removal effect is the relative
    reachability drop when its inbound edges redirect to NULL. All five
    variants (full + 4 removals) iterate together, keyed by variant.
    Transition probabilities are ratios of exact integer counts, the
    iteration is the identical double algebra in both engines, and only
    the final reachability is e9-grid-quantized.

    Scale design: one fact-sized window pass builds the journey hops;
    everything after is a ≤(5 variants × ~8 states) relation iterated 12
    times — metadata regardless of corpus size. The truncation depth is
    part of the metric's definition (journeys longer than 12 hops
    contribute through their first 12)."""
    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(wseq).alias("rn")
    )
    hops = seq.select(
        "user_id",
        F.col("event_type").alias("from_state"),
        F.lead("event_type").over(Window.partitionBy("user_id").orderBy("rn")).alias(
            "nxt"
        ),
    )
    starts = seq.where(F.col("rn") == 1).select(
        F.lit("START").alias("from_state"), F.col("event_type").alias("to_state")
    )
    steps = hops.select(
        F.when(F.col("from_state") == "purchase", F.lit(None))
        .otherwise(F.col("from_state"))
        .alias("from_state"),
        F.coalesce(F.col("nxt"), F.lit("NULL")).alias("to_state"),
    ).where(F.col("from_state").isNotNull())
    trans = (
        starts.unionAll(steps)
        .groupBy("from_state", "to_state")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    variants = spark.createDataFrame(
        [("full", "")] + [(f"rm_{c}", c) for c in _CHANNELS], "variant string, removed string"
    )
    redirected = F.when(F.col("to_state") == F.col("removed"), F.lit("NULL")).otherwise(
        F.col("to_state")
    )
    wtot = Window.partitionBy("variant", "from_state")
    tv = (
        trans.crossJoin(F.broadcast(variants))
        .where(F.col("from_state") != F.col("removed"))
        .groupBy("variant", "from_state", redirected.alias("to_state"))
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .withColumn("tot", F.sum("cnt").over(wtot).cast("bigint"))
        .localCheckpoint()
    )
    states = (
        trans.select(F.col("to_state").alias("state"))
        .union(trans.select(F.col("from_state").alias("state")))
        .distinct()
    )
    v = variants.select("variant").crossJoin(states).select(
        "variant",
        "state",
        F.when(F.col("state") == "purchase", F.lit(1.0)).otherwise(F.lit(0.0)).alias("p"),
    )
    for t in range(_MKV_ROUNDS):
        relaxed = (
            tv.join(
                v.select(
                    "variant", F.col("state").alias("to_state"), F.col("p").alias("pp")
                ),
                ["variant", "to_state"],
            )
            .groupBy("variant", F.col("from_state").alias("state"))
            .agg(
                F.sum(
                    F.col("cnt").cast("double") / F.col("tot").cast("double") * F.col("pp")
                ).alias("p")
            )
        )
        # re-inject the absorbing CONV state (no outgoing edges — the
        # relax step drops it, which would break within-k reachability)
        v = relaxed.unionAll(v.where(F.col("state") == "purchase"))
        if t % 4 == 3:
            v = v.localCheckpoint()
    reach = v.where(F.col("state") == "START").select(
        "variant",
        F.floor(F.col("p") * 1000000000.0 + F.lit(0.5)).cast("bigint").alias("p_conv_e9"),
    )
    full = reach.where(F.col("variant") == "full").select(
        F.col("p_conv_e9").alias("full_e9")
    )
    return reach.crossJoin(F.broadcast(full)).select(
        "variant",
        "p_conv_e9",
        F.when(F.col("variant") == "full", F.lit(0).cast("bigint"))
        .otherwise(int_ratio(F.col("full_e9") - F.col("p_conv_e9"), F.col("full_e9"), 6))
        .alias("removal_effect_e6"),
    )


def _shapley_oracle() -> str:
    bit = {c: 1 << i for i, c in enumerate(_CHANNELS)}
    mask_expr = " + ".join(
        f"MAX(CASE WHEN event_type = '{c}' THEN {b} ELSE 0 END)" for c, b in bit.items()
    )
    chan_rows = ", ".join(f"('{c}', {b})" for c, b in bit.items())
    return f"""
        WITH u AS (
            SELECT user_id,
                   CAST({mask_expr} AS BIGINT) AS mask,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id
        ),
        subs AS (SELECT UNNEST(range(0, 16)) AS s),
        vs AS MATERIALIZED (
            SELECT s,
                   CAST(SUM(CASE WHEN (mask & ~s) = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_s,
                   CAST(SUM(CASE WHEN (mask & ~s) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tot_s
            FROM u CROSS JOIN subs
            GROUP BY s
        ),
        ve AS (
            SELECT s, tot_s,
                   CASE WHEN tot_s = 0 THEN 0
                        ELSE {duck_int_ratio("conv_s", "tot_s", 9)} END AS v_e9
            FROM vs
        ),
        chans(channel, bit) AS (VALUES {chan_rows}),
        terms AS (
            SELECT c.channel,
                   CASE bit_count(CAST(a.s AS BIGINT))
                        WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6
                   END * (b.v_e9 - a.v_e9) AS t
            FROM chans c
            JOIN ve a ON (a.s & c.bit) = 0
            JOIN ve b ON b.s = a.s + c.bit
        )
        SELECT channel, CAST(SUM(t) AS BIGINT) AS shapley_x24_e9
        FROM terms GROUP BY channel
    """


@register(
    "shapley_channel_attribution",
    oracle=_shapley_oracle(),
    tags=("attribution", "shapley", "events"),
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution over the 4 non-purchase
    event types: coalition value v(S) = conversion rate among users
    whose channel set ⊆ S (0 for empty coalitions of users), all 16
    coalitions enumerated, factorial weights |S|!(3−|S|)!/4! scaled by
    24 (→ 6,2,2,6) and values e9-quantized, so each channel's Shapley
    value arrives as the exact integer Σ w24·(v(S∪{i})−v(S)). The
    axiomatically fair attribution next to the Markov removal effect —
    exact here because the channel universe is small (2^4 coalitions),
    which is the realistic marketing case.

    Scale design: one fact scan folds to (user → channel bitmask, conv);
    the 16-coalition cross join is against a broadcast inline relation;
    everything after is a 16-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    bit = {c: 1 << i for i, c in enumerate(_CHANNELS)}
    mask = sum(
        (F.max(F.when(F.col("event_type") == c, b).otherwise(0)) for c, b in bit.items()),
        F.lit(0),
    )
    u = ev.groupBy("user_id").agg(
        mask.cast("bigint").alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
    )
    subs = spark.range(16).select(F.col("id").cast("bigint").alias("s"))
    inc = F.when((F.col("mask").bitwiseAND(F.lit(15) - F.col("s"))) == 0, 1).otherwise(0)
    vs = (
        u.crossJoin(F.broadcast(subs))
        .groupBy("s")
        .agg(
            F.sum(inc * F.col("conv")).cast("bigint").alias("conv_s"),
            F.sum(inc).cast("bigint").alias("tot_s"),
        )
    )
    ve = vs.select(
        "s",
        F.when(F.col("tot_s") == 0, F.lit(0).cast("bigint"))
        .otherwise(int_ratio(F.col("conv_s"), F.col("tot_s"), 9))
        .alias("v_e9"),
    ).localCheckpoint()
    chans = spark.createDataFrame(
        [(c, b) for c, b in bit.items()], "channel string, bit bigint"
    )
    a = ve.select(F.col("s").alias("sa"), F.col("v_e9").alias("va"))
    b = ve.select(F.col("s").alias("sb"), F.col("v_e9").alias("vb"))
    w24 = (
        F.when(F.bit_count(F.col("sa")) == 0, 6)
        .when(F.bit_count(F.col("sa")) == 1, 2)
        .when(F.bit_count(F.col("sa")) == 2, 2)
        .otherwise(6)
    )
    terms = (
        chans.crossJoin(a)
        .where(F.col("sa").bitwiseAND(F.col("bit")) == 0)
        .join(b, F.col("sb") == F.col("sa") + F.col("bit"))
        .select("channel", (w24 * (F.col("vb") - F.col("va"))).alias("t"))
    )
    return terms.groupBy("channel").agg(
        F.sum("t").cast("bigint").alias("shapley_x24_e9")
    )
