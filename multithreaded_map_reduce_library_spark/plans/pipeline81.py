"""Pipeline batch 81 (round 4): FELLEGI-SUNTER LINKAGE SCORING + SCHEMA
DRIFT DETECTION — the probabilistic layer for the record-linkage tier and
a data-contract monitor.

* ``fellegi_sunter_linkage`` — the classical probabilistic record-linkage
  model (Fellegi & Sunter 1969) on nation-blocked customer pairs: each
  pair's agreement pattern γ over (market segment, account-balance band)
  gets the log₂ likelihood-ratio weight Σ ln(m/u) / ln((1−m)/(1−u)),
  with u-probabilities ESTIMATED FROM THE DATA (collision probability of
  two random records) and m fixed at the conventional 0.95/0.9. This is
  the scoring layer that sits on top of the existing blocking queries
  (``fuzzy_blocked_name_pairs``, ``sorted_neighborhood_pairs``): patterns
  with positive total weight are link candidates.
* ``schema_drift_detection`` — profiles two snapshots of the orders table
  (before/after 1998-01-01) and emits one row per (column, metric) with
  both values and a relative-delta drift flag: the null-rate / NDV /
  mean-shift contract check a pipeline runs when a new data drop lands.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
neither tier; both extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_grid,
    duck_int_ratio,
    grid,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_M_SEG = 0.95  # assumed P(segment agrees | true match)
_M_BAL = 0.90  # assumed P(balance band agrees | true match)


@register(
    "fellegi_sunter_linkage",
    oracle=f"""
        WITH c AS (
            SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg,
                   CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
            FROM customer
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST((SELECT SUM(m * m) FROM (
                        SELECT COUNT(*) AS m FROM c GROUP BY seg)) AS BIGINT) AS sq_seg,
                   CAST((SELECT SUM(m * m) FROM (
                        SELECT COUNT(*) AS m FROM c GROUP BY band)) AS BIGINT) AS sq_bal
            FROM c
        ),
        pairs AS (
            SELECT CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g_seg,
                   CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS g_bal
            FROM c a JOIN c b ON a.nk = b.nk AND a.ck < b.ck
        ),
        pat AS (
            SELECT g_seg, g_bal, COUNT(*) AS n_pairs
            FROM pairs GROUP BY g_seg, g_bal
        )
        SELECT p.g_seg, p.g_bal,
               CAST(p.n_pairs AS BIGINT) AS n_pairs,
               {duck_grid(
                   "(CASE WHEN p.g_seg = 1 "
                   f" THEN ln({_M_SEG} / (CAST(s.sq_seg AS DOUBLE) / CAST(s.n * s.n AS DOUBLE)))"
                   f" ELSE ln((1.0 - {_M_SEG}) / (1.0 - CAST(s.sq_seg AS DOUBLE) / CAST(s.n * s.n AS DOUBLE))) END"
                   " + CASE WHEN p.g_bal = 1 "
                   f" THEN ln({_M_BAL} / (CAST(s.sq_bal AS DOUBLE) / CAST(s.n * s.n AS DOUBLE)))"
                   f" ELSE ln((1.0 - {_M_BAL}) / (1.0 - CAST(s.sq_bal AS DOUBLE) / CAST(s.n * s.n AS DOUBLE))) END"
                   ") / ln(2.0)", 6)} AS weight_e6
        FROM pat p CROSS JOIN stats s
    """,
    tags=("record-linkage", "fellegi-sunter", "customer", "blocked"),
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter agreement-pattern weights over nation-blocked
    customer pairs: fields are market segment and the coarse account
    balance band FLOOR(acctbal/1000); u-probabilities (chance agreement
    between two random records) are estimated from the field value
    distributions as Σ(nᵥ/N)², m-probabilities are the conventional
    0.95/0.9; each of the 4 agreement patterns gets its total log₂
    likelihood-ratio weight. Positive-weight patterns are link
    candidates — the decision layer of probabilistic record linkage,
    summarized at pattern granularity so the output stays tiny at any
    scale. The ln() inputs are identical IEEE doubles in both engines
    (exact integer counts + one division), the established grid-safety
    argument of the TF-IDF family.

    Scale design: pairs exist only inside nation blocks (the blocking
    discipline of the linkage tier — never all-pairs); the pattern
    rollup collapses them to 4 rows before the weight math, and the
    u-statistics are one grand aggregate broadcast across those rows."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("band"),
    )
    n = c.agg(F.count("*").cast("bigint").alias("n"))
    sq_seg = (
        c.groupBy("seg")
        .agg(F.count("*").alias("m"))
        .agg(F.sum(F.col("m") * F.col("m")).cast("bigint").alias("sq_seg"))
    )
    sq_bal = (
        c.groupBy("band")
        .agg(F.count("*").alias("m"))
        .agg(F.sum(F.col("m") * F.col("m")).cast("bigint").alias("sq_bal"))
    )
    a = c.select(F.col("ck").alias("cka"), "nk", F.col("seg").alias("sega"), F.col("band").alias("banda"))
    b = c.select(F.col("ck").alias("ckb"), "nk", F.col("seg").alias("segb"), F.col("band").alias("bandb"))
    pat = (
        a.join(b, "nk")
        .where(F.col("cka") < F.col("ckb"))
        .select(
            F.when(F.col("sega") == F.col("segb"), 1).otherwise(0).alias("g_seg"),
            F.when(F.col("banda") == F.col("bandb"), 1).otherwise(0).alias("g_bal"),
        )
        .groupBy("g_seg", "g_bal")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )
    stats = n.crossJoin(F.broadcast(sq_seg)).crossJoin(F.broadcast(sq_bal))
    u_seg = F.col("sq_seg").cast("double") / (F.col("n") * F.col("n")).cast("double")
    u_bal = F.col("sq_bal").cast("double") / (F.col("n") * F.col("n")).cast("double")
    w = (
        F.when(F.col("g_seg") == 1, F.log(F.lit(_M_SEG) / u_seg)).otherwise(
            F.log(F.lit(1.0 - _M_SEG) / (F.lit(1.0) - u_seg))
        )
        + F.when(F.col("g_bal") == 1, F.log(F.lit(_M_BAL) / u_bal)).otherwise(
            F.log(F.lit(1.0 - _M_BAL) / (F.lit(1.0) - u_bal))
        )
    ) / F.log(F.lit(2.0))
    return (
        pat.crossJoin(F.broadcast(stats))  # 1-row grand aggregate (BNLJ-exempt)
        .select("g_seg", "g_bal", "n_pairs", grid(w, 6).alias("weight_e6"))
    )


_CUTOFF = "1998-01-01"


def _duck_profile(side: str, cond: str) -> str:
    """One snapshot's per-column profile rows (column, metric, value)."""
    return f"""
            SELECT 'o_totalprice' AS col, 'mean_cents' AS metric,
                   {duck_int_ratio("CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)", "COUNT(*)", 0)} AS v,
                   '{side}' AS side
            FROM orders WHERE {cond}
            UNION ALL
            SELECT 'o_totalprice', 'ndv', CAST(COUNT(DISTINCT o_totalprice) AS BIGINT), '{side}'
            FROM orders WHERE {cond}
            UNION ALL
            SELECT 'o_orderstatus', 'ndv', CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT), '{side}'
            FROM orders WHERE {cond}
            UNION ALL
            SELECT 'o_orderpriority', 'ndv', CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT), '{side}'
            FROM orders WHERE {cond}
            UNION ALL
            SELECT 'o_custkey', 'ndv', CAST(COUNT(DISTINCT o_custkey) AS BIGINT), '{side}'
            FROM orders WHERE {cond}
            UNION ALL
            SELECT 'any', 'row_count', CAST(COUNT(*) AS BIGINT), '{side}'
            FROM orders WHERE {cond}
    """


@register(
    "schema_drift_detection",
    oracle=f"""
        WITH prof AS (
            {_duck_profile('a', f"o_orderdate < TIMESTAMP '{_CUTOFF}'")}
            UNION ALL
            {_duck_profile('b', f"o_orderdate >= TIMESTAMP '{_CUTOFF}'")}
        ),
        wide AS (
            SELECT col, metric,
                   CAST(MAX(CASE WHEN side = 'a' THEN v END) AS BIGINT) AS val_a,
                   CAST(MAX(CASE WHEN side = 'b' THEN v END) AS BIGINT) AS val_b
            FROM prof GROUP BY col, metric
        )
        SELECT col, metric, val_a, val_b,
               {duck_int_ratio("ABS(val_a - val_b)", "GREATEST(ABS(val_a), ABS(val_b), 1)", 6)} AS rel_delta_e6,
               {duck_int_ratio("ABS(val_a - val_b)", "GREATEST(ABS(val_a), ABS(val_b), 1)", 6)} > 100000 AS drift
        FROM wide
    """,
    tags=("data-quality", "drift", "profiling", "orders"),
)
def schema_drift_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-drift contract check on the orders table: profile the
    pre- and post-1998 snapshots (row count, per-column NDV, mean price
    in half-up cents), align the profiles, and flag any metric whose
    relative change exceeds 10% — the cheap schema/content monitor a
    pipeline runs on every new data drop before it reaches training.
    All-integer metrics (cents, counts), exact ratio grid.

    Scale design: each profile is one pass of hash aggregates over the
    snapshot scan (COUNT DISTINCT shuffles per column; at 100 TB these
    become approx_count_distinct with a documented tolerance); the
    profile alignment and delta math run on a dozen rows."""
    orders = load_table(spark, sf_dir, "orders")

    def profile(side: str, df: DataFrame) -> DataFrame:
        cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
        rows = [
            df.agg(
                int_ratio(F.sum(cents), F.count("*"), 0).alias("v")
            ).select(
                F.lit("o_totalprice").alias("col"),
                F.lit("mean_cents").alias("metric"),
                "v",
                F.lit(side).alias("side"),
            )
        ]
        for colname in ["o_totalprice", "o_orderstatus", "o_orderpriority", "o_custkey"]:
            rows.append(
                df.agg(F.countDistinct(colname).cast("bigint").alias("v")).select(
                    F.lit(colname).alias("col"),
                    F.lit("ndv").alias("metric"),
                    "v",
                    F.lit(side).alias("side"),
                )
            )
        rows.append(
            df.agg(F.count("*").cast("bigint").alias("v")).select(
                F.lit("any").alias("col"),
                F.lit("row_count").alias("metric"),
                "v",
                F.lit(side).alias("side"),
            )
        )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionAll(r)
        return out

    cutoff = F.lit(_CUTOFF).cast("timestamp")
    prof = profile("a", orders.where(F.col("o_orderdate") < cutoff)).unionAll(
        profile("b", orders.where(F.col("o_orderdate") >= cutoff))
    )
    wide = prof.groupBy("col", "metric").agg(
        F.max(F.when(F.col("side") == "a", F.col("v"))).cast("bigint").alias("val_a"),
        F.max(F.when(F.col("side") == "b", F.col("v"))).cast("bigint").alias("val_b"),
    )
    rel = int_ratio(
        F.abs(F.col("val_a") - F.col("val_b")),
        F.greatest(F.abs(F.col("val_a")), F.abs(F.col("val_b")), F.lit(1)),
        6,
    )
    return wide.select(
        "col",
        "metric",
        "val_a",
        "val_b",
        rel.alias("rel_delta_e6"),
        (rel > F.lit(100_000)).alias("drift"),
    )
