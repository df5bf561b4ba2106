"""Pipeline batch 119 (round 4): STREAMING EWMA + WEIGHTED MEDIAN —
the promised streaming twin of the batch EWMA fold (pipeline6:24
docstring: "the streaming twin is applyInPandasWithState carrying
(ewma) as state, same recurrence"), and the weighted member of the
median family:

* ``stream_ewma_user_values`` — per-user EWMA (α=0.2, seeded with the
  first observation) as GroupState: the state carries (ewma, n,
  last_ts, last_event_id) and each micro-batch folds its rows in
  (ts, event_id) order with the SAME two IEEE ops as the batch fold —
  so the final state is bit-identical to the batch answer whenever
  micro-batches arrive time-ordered, and the kernel RAISES (fail
  loud, the envelope discipline) if an out-of-order arrival would
  silently corrupt the recurrence.
* ``weighted_median_price`` — the quantity-weighted lower median of
  lineitem extended price per return flag: exact integer cumulative-
  weight walk to the first price with cum ≥ ceil(W/2) — the weighted
  quantile rule plain median cannot express.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no streaming or statistics tier; these extend the driver-mandated
superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "stream_ewma_user_values",
    oracle="""
        WITH a AS (
            SELECT user_id,
                   list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events,
               CAST(FLOOR(list_reduce(vals,
                     (acc, x) -> acc * CAST(0.8 AS DOUBLE)
                                 + x * CAST(0.2 AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
                   AS ewma_e4
        FROM a
    """,
    tags=("streaming", "stateful", "ewma", "applyInPandasWithState"),
)
def stream_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user EWMA: GroupState carries (ewma, n, last_ts,
    last_event_id); each micro-batch sorts its rows by (ts, event_id)
    and folds acc*0.8 + x*0.2 — the exact op sequence of the batch
    fold (`ewma_user_values`, pipeline6), so time-ordered micro-batches
    reproduce the batch answer BIT-identically (the oracle is the batch
    twin's). An arrival older than the state's frontier raises — the
    recurrence is order-sensitive, and silent reordering must fail
    loud, not drift.

    Scale design: O(1) state per user (two doubles + a frontier);
    per-batch work is one sorted fold per touched user — the canonical
    monitoring-baseline operator at unbounded key cardinality."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import Window

    from multithreaded_map_reduce_library_spark.streaming.windows import (
        events_stream,
        run_stream_to_df,
    )

    out_schema = "user_id bigint, nb bigint, n_events bigint, ewma_e4 bigint"
    state_schema = (
        "ewma double, n_events bigint, last_ts timestamp, last_eid bigint, nb bigint"
    )

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            ewma, n, last_ts, last_eid, nb = state.get
        else:
            ewma, n, last_ts, last_eid, nb = None, 0, None, -1, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, eid, v in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
                if last_ts is not None and (ts, eid) <= (last_ts, last_eid):
                    raise ValueError(
                        f"user {key[0]}: out-of-order arrival ({ts},{eid}) after"
                        f" state frontier ({last_ts},{last_eid}) — EWMA recurrence"
                        " requires time-ordered micro-batches"
                    )
                x = float(v)
                ewma = x if ewma is None else ewma * 0.8 + x * 0.2
                n += 1
                last_ts, last_eid = ts, eid
        nb += 1
        state.update((ewma, n, last_ts, last_eid, nb))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "nb": [nb],
                "n_events": [n],
                "ewma_e4": [None if ewma is None else int(__import__("math").floor(ewma * 10000.0 + 0.5))],
            }
        )

    ev = events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    updates = run_stream_to_df(
        spark,
        ev.groupBy("user_id").applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        ),
        "update",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("nb"))
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "ewma_e4")
    )


@register(
    "weighted_median_price",
    oracle="""
        WITH pts AS (
            SELECT l_returnflag AS flag,
                   CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price,
                   CAST(SUM(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
        ),
        tot AS (
            SELECT flag, CAST(SUM(w) AS BIGINT) AS wt FROM pts GROUP BY flag
        ),
        cum AS (
            SELECT flag, price, w,
                   CAST(SUM(w) OVER (PARTITION BY flag ORDER BY price)
                        AS BIGINT) AS cw
            FROM pts
        )
        SELECT cum.flag, tot.wt AS total_weight,
               CAST(MIN(cum.price) AS BIGINT) AS wmedian_price_cents
        FROM cum JOIN tot ON tot.flag = cum.flag
                          AND cum.cw >= (tot.wt + 1) // 2
        GROUP BY cum.flag, tot.wt
        ORDER BY cum.flag
    """,
    tags=("statistics", "weighted-median", "lineitem", "global-sort"),
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted lower median of extended price per return
    flag: the first price (ascending) whose cumulative quantity weight
    reaches ceil(W/2) — exact integer walk on the (flag, price) rollup.
    The weighted quantile the plain `median_quantity_by_flag` family
    cannot express (heavy rows count more).

    Scale design: one map-side-combined rollup to (flag, price), then
    per-flag cumulative windows on that skinny relation; price
    pre-bucketing (cents) bounds the walked relation at any corpus
    size."""
    from pyspark.sql.window import Window

    pts = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
            .cast("bigint")
            .alias("price"),
        )
        .agg(F.sum("l_quantity").cast("bigint").alias("w"))
    )
    tot = pts.groupBy("flag").agg(F.sum("w").cast("bigint").alias("wt"))
    wcum = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pts.select(
        "flag", "price", F.sum("w").over(wcum).cast("bigint").alias("cw")
    )
    half = F.call_function(
        "div", F.col("wt") + 1, F.lit(2).cast("bigint")
    )
    return (
        cum.join(tot, "flag")
        .where(F.col("cw") >= half)
        .groupBy("flag", "wt")
        .agg(F.min("price").cast("bigint").alias("wmedian_price_cents"))
        .select("flag", F.col("wt").alias("total_weight"), "wmedian_price_cents")
        .orderBy("flag")
    )
