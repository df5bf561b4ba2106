"""Pipeline batch 35: the KMV sketch as STREAMING STATE — bounded-state
distinct estimation per day via ``applyInPandasWithState``, whose final
state is provably identical to the batch sketch (KMV merge law: the
K smallest of a union do not depend on arrival order or batch
boundaries — tests/test_sketch_iterative.py::test_kmv_merge_law), so
the DuckDB oracle replays the exact estimate. The streaming twin of
``kmv_distinct_users_daily`` and the capstone of the sketch tier:
HLL-style bounded state with NONE of HLL's engine-specific opacity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.pipeline21 import (
    _KMV_K,
    _POW48,
    _hash48_sql,
)
from multithreaded_map_reduce_library_spark.plans.registry import register


@register(
    "stream_kmv_distinct_daily",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day,
                   {_hash48_sql("user_id")} AS h
            FROM events
        ),
        r AS (
            SELECT day, h,
                   ROW_NUMBER() OVER (PARTITION BY day ORDER BY h ASC) AS rk,
                   COUNT(*) OVER (PARTITION BY day) AS n_exact
            FROM h
        ),
        kth AS (SELECT day, h AS h_k FROM r WHERE rk = {_KMV_K})
        SELECT r.day,
               CAST(FLOOR((CASE WHEN kth.h_k IS NULL
                          THEN CAST(r.n_exact AS DOUBLE)
                          ELSE CAST({_KMV_K - 1} AS DOUBLE) * {_POW48} / kth.h_k
                     END) * 1000000.0 + 0.5) AS BIGINT) AS est_e6
        FROM (SELECT DISTINCT day, n_exact FROM r) r
        LEFT JOIN kth USING (day)
    """,
    tags=("streaming", "stateful", "sketch", "kmv", "applyInPandasWithState"),
)
def stream_kmv_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-user estimation with a KMV sketch held in
    GroupState: each day's state is AT MOST K=16 hashes (64 bytes —
    bounded regardless of throughput, the whole point of sketch state),
    updated per micro-batch by merging the batch's hashes and
    re-truncating to the K smallest. Because the K-minimum set is
    arrival-order- and batch-boundary-invariant (the KMV merge law),
    the final per-day estimate is deterministic and equals the batch
    sketch — which is exactly what the oracle computes.

    Scale design: state size is K * 8 bytes per day key (compare the
    unbounded per-day user set an exact streaming distinct needs);
    updates are Arrow-batched; the post-drain final-row pick rides the
    monotone update counter. This is the production shape for
    "distinct users per window, forever" dashboards.
    """
    import hashlib

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import Window

    from multithreaded_map_reduce_library_spark.streaming.windows import (
        events_stream,
        run_stream_to_df,
    )

    k = _KMV_K
    out_schema = "day date, nb bigint, est_e6 bigint"
    state_schema = "hashes array<bigint>, nb bigint"

    def update(key, pdf_iter, state: GroupState):
        hashes, nb = (list(state.get[0]), state.get[1]) if state.exists else ([], 0)
        have = set(hashes)
        for pdf in pdf_iter:
            for uid in pdf["user_id"]:
                h = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:12], 16)
                if h not in have:
                    have.add(h)
        hashes = sorted(have)[:k]  # merge law: K smallest of the union
        nb += 1
        state.update((hashes, nb))
        if len(hashes) < k:
            est = float(len(hashes))
        else:
            est = float(k - 1) * _POW48 / hashes[k - 1]
        # grid rule: FLOOR(x*1e6+0.5) — same IEEE ops as the oracle
        # (Python round() is banker's and would tie differently).
        import math

        est_e6 = int(math.floor(est * 1000000.0 + 0.5))
        yield pd.DataFrame({"day": [key[0]], "nb": [nb], "est_e6": [est_e6]})

    ev = events_stream(spark, sf_dir).withColumn("day", F.to_date("ts"))
    updates = run_stream_to_df(
        spark,
        ev.groupBy("day").applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        ),
        "update",
    )
    w = Window.partitionBy("day").orderBy(F.desc("nb"))
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("day", "est_e6")
    )
