"""Pipeline batch 103 (round 4): COUNT-MIN SKETCH AS STREAMING STATE —
the CMS sibling of ``stream_kmv_distinct_daily`` (pipeline35): per-day
frequency sketching with a bounded 4×32 integer counter matrix held in
``applyInPandasWithState``. CMS is ADDITIVE (counter[r][c] sums arrival
counts — no order or batch-boundary dependence at all, an even stronger
merge law than KMV's), so the final streaming state provably equals the
batch sketch and the DuckDB oracle replays it exactly:

* the position-weighted checksum Σ counter[r][c]·(r·32+c+1) pins every
  cell (computable in SQL without materializing the matrix — it folds
  to a per-event expression);
* the summed per-row max is the sketch's skew signal (what a heavy-
  hitter gate reads);
* n_events audits the conservation law Σ_c counter[r][c] = n per row.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
streaming tier; this extends the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register

_DEPTH = 4
_WIDTH = 32


def _col_sql(r: int) -> str:
    """DuckDB twin of the kernel's md5 column hash for row r."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('{r}|' || CAST(user_id AS VARCHAR)), {p}, 1)) - 1) * {16 ** (8 - p)}"
        for p in range(1, 9)
    )
    return f"(({terms}) % {_WIDTH})"


@register(
    "stream_cms_user_counts_daily",
    oracle=f"""
        WITH e AS (
            SELECT CAST(ts AS DATE) AS day, user_id,
                   {" + ".join(_col_sql(r) for r in range(_DEPTH))} AS colsum
            FROM events
        ),
        base AS (
            SELECT day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(colsum) + COUNT(*) * {sum(r * _WIDTH + 1 for r in range(_DEPTH))} AS BIGINT) AS cms_checksum
            FROM e GROUP BY day
        ),
        cells AS (
            SELECT day, r, c, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT day, u.r AS r,
                       CASE u.r {" ".join(f"WHEN {r} THEN {_col_sql(r)}" for r in range(_DEPTH))} END AS c
                FROM e CROSS JOIN (SELECT UNNEST(range(0, {_DEPTH})) AS r) u
            ) GROUP BY day, r, c
        ),
        rowmax AS (
            SELECT day, CAST(SUM(mx) AS BIGINT) AS sum_row_max
            FROM (SELECT day, r, MAX(cnt) AS mx FROM cells GROUP BY day, r)
            GROUP BY day
        )
        SELECT b.day, b.n_events, b.cms_checksum, rm.sum_row_max
        FROM base b JOIN rowmax rm USING (day)
    """,
    tags=("streaming", "stateful", "sketch", "cms", "applyInPandasWithState"),
)
def stream_cms_user_counts_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-day Count-Min Sketch of user arrivals: GroupState
    holds the 4x32 integer counter matrix (1 KB per day key — bounded
    regardless of throughput or cardinality), updated additively per
    micro-batch. Additivity means the final state cell-for-cell equals
    the batch sketch however the stream is batched; the emitted
    position-weighted checksum, per-row-max sum, and event count pin it
    against the SQL replay.

    Scale design: CMS is the sketch for streaming frequency/heavy-hitter
    gates at unbounded key cardinality (exact per-key state grows with
    users; this is 128 ints, period). The checksum trick keeps the
    oracle matrix-free: Σ counter·(r·32+c+1) folds to one expression
    per event."""
    import hashlib

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import Window

    from multithreaded_map_reduce_library_spark.streaming.windows import (
        events_stream,
        run_stream_to_df,
    )

    out_schema = "day date, nb bigint, n_events bigint, cms_checksum bigint, sum_row_max bigint"
    state_schema = "counters array<bigint>, n_events bigint, nb bigint"

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            counters, n_events, nb = list(state.get[0]), state.get[1], state.get[2]
        else:
            counters, n_events, nb = [0] * (_DEPTH * _WIDTH), 0, 0
        for pdf in pdf_iter:
            for uid in pdf["user_id"]:
                n_events += 1
                for r in range(_DEPTH):
                    c = (
                        int(
                            hashlib.md5(f"{r}|{int(uid)}".encode()).hexdigest()[:8], 16
                        )
                        % _WIDTH
                    )
                    counters[r * _WIDTH + c] += 1
        nb += 1
        state.update((counters, n_events, nb))
        checksum = sum(v * (i + 1) for i, v in enumerate(counters))
        srm = sum(
            max(counters[r * _WIDTH : (r + 1) * _WIDTH]) for r in range(_DEPTH)
        )
        yield pd.DataFrame(
            {
                "day": [key[0]],
                "nb": [nb],
                "n_events": [n_events],
                "cms_checksum": [checksum],
                "sum_row_max": [srm],
            }
        )

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
        .select("day", "n_events", "cms_checksum", "sum_row_max")
    )
