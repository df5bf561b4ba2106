"""Pipeline batch 123 (round 4): INCREMENTAL JOIN MAINTENANCE — the
delta algebra behind every incremental view maintenance engine
(differential dataflow, Materialize, Delta Live Tables), checked as an
exact conservation law:

``incremental_join_delta_algebra`` — split events at day 20 into base
(B) and delta (Δ); for the click⋈purchase user-keyed join,
J(B∪Δ) = J(B,B) + J(B,Δ) + J(Δ,B) + J(Δ,Δ). The query computes all
four delta terms AND the full join independently, emits each count
plus the matched-user count, and asserts conservation — the algebra a
streaming materialization relies on, verified against the batch
recompute in one relation. (The aggregate sibling is
`incremental_agg_merge_daily`; this is the JOIN member.)

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no incremental tier; this extends the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_CUT = "2024-01-21"


@register(
    "incremental_join_delta_algebra",
    oracle=f"""
        WITH c AS (
            SELECT user_id, CAST(ts AS DATE) < DATE '{_CUT}' AS is_base
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, CAST(ts AS DATE) < DATE '{_CUT}' AS is_base
            FROM events WHERE event_type = 'purchase'
        ),
        cu AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS cb,
                   CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS cd
            FROM c GROUP BY user_id
        ),
        pu AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS pb,
                   CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS pd
            FROM p GROUP BY user_id
        ),
        terms AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_matched_users,
                   CAST(SUM(cb * pb) AS BIGINT) AS j_bb,
                   CAST(SUM(cb * pd) AS BIGINT) AS j_bd,
                   CAST(SUM(cd * pb) AS BIGINT) AS j_db,
                   CAST(SUM(cd * pd) AS BIGINT) AS j_dd,
                   CAST(SUM((cb + cd) * (pb + pd)) AS BIGINT) AS j_full
            FROM cu JOIN pu USING (user_id)
        )
        SELECT n_matched_users, j_bb, j_bd, j_db, j_dd, j_full,
               (j_bb + j_bd + j_db + j_dd = j_full) AS conserved
        FROM terms
    """,
    tags=("incremental", "ivm", "join", "events"),
)
def incremental_join_delta_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM delta algebra for the user-keyed click⋈purchase join: with
    events split at day 20 into base and delta, the four delta terms
    J(B,B), J(B,Δ), J(Δ,B), J(Δ,Δ) are computed from per-user
    (base, delta) count pairs — each term an exact integer product-sum
    — alongside the full-join count, and `conserved` asserts
    J(B∪Δ) = ΣJ terms exactly. This is the identity an incremental
    materialization applies every micro-batch instead of re-joining
    the world; here it is a checked fact, not an assumption.

    Scale design: per-user conditional counts are one shuffle each
    (map-side combined); the join carries two ints per matched user.
    The same algebra holds per-key at any cardinality — the delta
    terms never touch base×base again, which is the entire point of
    IVM at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(_CUT).cast("date")
    base_flag = F.col("ts").cast("date") < cut

    def per_user(event_type: str, b: str, d: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == event_type)
            .groupBy("user_id")
            .agg(
                F.sum(F.when(base_flag, 1).otherwise(0)).cast("bigint").alias(b),
                F.sum(F.when(base_flag, 0).otherwise(1)).cast("bigint").alias(d),
            )
        )

    cu = per_user("click", "cb", "cd")
    pu = per_user("purchase", "pb", "pd")
    terms = cu.join(pu, "user_id").agg(
        F.count("*").cast("bigint").alias("n_matched_users"),
        F.sum(F.col("cb") * F.col("pb")).cast("bigint").alias("j_bb"),
        F.sum(F.col("cb") * F.col("pd")).cast("bigint").alias("j_bd"),
        F.sum(F.col("cd") * F.col("pb")).cast("bigint").alias("j_db"),
        F.sum(F.col("cd") * F.col("pd")).cast("bigint").alias("j_dd"),
        F.sum((F.col("cb") + F.col("cd")) * (F.col("pb") + F.col("pd")))
        .cast("bigint")
        .alias("j_full"),
    )
    return terms.select(
        "n_matched_users",
        "j_bb",
        "j_bd",
        "j_db",
        "j_dd",
        "j_full",
        (
            F.col("j_bb") + F.col("j_bd") + F.col("j_db") + F.col("j_dd")
            == F.col("j_full")
        ).alias("conserved"),
    )
