"""Pipeline batch 118 (round 4): LEARNED-INDEX AUDIT + ROARING
CONTAINER SIZING — two storage/indexing estimators joining the
zone-map / RLE / dictionary / varint family:

* ``learned_index_audit`` — the RMI-leaf audit (Kraska et al., 2018):
  OLS-fit rank ≈ a + b·key over the 'F'-status order-key posting list
  (a nonuniform subset, so the CDF model has real error), with
  moments as exact int64 sums, the fit in doubles of exact ints (the
  CUPED discipline), and the MAX absolute prediction error — the
  binary-search window a learned index must keep per leaf — plus the
  mean absolute error on the e6 grid.
* ``bitmap_container_stats`` — Roaring-bitmap container planning for
  the per-status order-key sets: each 2^16-key chunk stores an array
  container (2 bytes/key) when ≤ 4096 keys else a fixed 8 KiB bitmap;
  emits per status the chunk/container mix, total bytes, and the
  compression ratio vs naive 8-byte keys — all exact integers.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
no storage tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import duck_int_ratio, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table


@register(
    "learned_index_audit",
    oracle="""
        WITH keys AS (
            SELECT o_orderkey AS k,
                   CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS r
            FROM orders WHERE o_orderstatus = 'F'
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS sk,
                   CAST(SUM(r) AS BIGINT) AS sr,
                   CAST(SUM(k * r) AS BIGINT) AS skr,
                   CAST(SUM(k * k) AS BIGINT) AS skk
            FROM keys
        ),
        fit AS (
            SELECT n, sk, sr,
                   (CAST(skr AS DOUBLE) * n - CAST(sk AS DOUBLE) * sr)
                   / (CAST(skk AS DOUBLE) * n - CAST(sk AS DOUBLE) * sk) AS b
            FROM mom
        ),
        pred AS (
            SELECT keys.r,
                   CAST(FLOOR((CAST(fit.sr AS DOUBLE) / fit.n
                               - fit.b * (CAST(fit.sk AS DOUBLE) / fit.n))
                              + fit.b * keys.k + 0.5) AS BIGINT) AS p
            FROM keys CROSS JOIN fit
        )
        SELECT (SELECT n FROM mom) AS n_keys,
               CAST(MAX(ABS(p - r)) AS BIGINT) AS max_err,
               CAST((SUM(ABS(p - r)) * 1000000
                     + (SELECT n FROM mom) // 2) // (SELECT n FROM mom) AS BIGINT)
                   AS mean_abs_err_e6
        FROM pred
    """,
    tags=("storage", "learned-index", "ols", "orders", "global-sort"),
)
def learned_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-index leaf audit over the 'F'-status order-key posting
    list: OLS rank-vs-key fit from exact integer moments (slope and
    intercept as doubles of exact int64s, identical expression both
    engines), per-key predicted rank rounded once, and the max / mean
    absolute error. max_err IS the search window: a learned index over
    this leaf must scan ±max_err positions after the model guess —
    the number that decides whether the model beats plain binary
    search.

    Scale design: one scan to the filtered keys, one window for ranks
    (at 100 TB: per-leaf ranks — leaves are partition-local by
    construction), a single moment row, one broadcast-fit map pass.
    Moment Σk² stays int64-exact through ~10M keys; DECIMAL(38,0)
    beyond."""
    keys = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .withColumn(
            "r",
            (F.row_number().over(Window.orderBy("k")) - 1).cast("bigint"),
        )
    )
    mom = keys.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum("r").cast("bigint").alias("sr"),
        F.sum(F.col("k") * F.col("r")).cast("bigint").alias("skr"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
    )
    b = (
        F.col("skr").cast("double") * F.col("n")
        - F.col("sk").cast("double") * F.col("sr")
    ) / (
        F.col("skk").cast("double") * F.col("n")
        - F.col("sk").cast("double") * F.col("sk")
    )
    a = F.col("sr").cast("double") / F.col("n") - b * (
        F.col("sk").cast("double") / F.col("n")
    )
    pred = keys.crossJoin(F.broadcast(mom)).select(
        "r",
        "n",
        F.floor(a + b * F.col("k") + F.lit(0.5)).cast("bigint").alias("p"),
    )
    return pred.groupBy("n").agg(
        F.max(F.abs(F.col("p") - F.col("r"))).cast("bigint").alias("max_err"),
        F.call_function(
            "div",
            F.sum(F.abs(F.col("p") - F.col("r"))) * 1000000
            + F.call_function("div", F.col("n"), F.lit(2).cast("bigint")),
            F.col("n"),
        )
        .cast("bigint")
        .alias("mean_abs_err_e6"),
    ).select(F.col("n").alias("n_keys"), "max_err", "mean_abs_err_e6")


@register(
    "bitmap_container_stats",
    oracle="""
        WITH chunks AS (
            SELECT o_orderstatus AS status,
                   o_orderkey // 65536 AS chunk,
                   CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nk
            FROM orders GROUP BY 1, 2
        ),
        sized AS (
            SELECT status, chunk, nk,
                   CASE WHEN nk <= 4096 THEN 2 * nk ELSE 8192 END AS bytes,
                   CASE WHEN nk <= 4096 THEN 1 ELSE 0 END AS is_array
            FROM chunks
        )
        SELECT status,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(is_array) AS BIGINT) AS n_array,
               CAST(COUNT(*) - SUM(is_array) AS BIGINT) AS n_bitmap,
               CAST(SUM(nk) AS BIGINT) AS n_keys,
               CAST(SUM(bytes) AS BIGINT) AS roaring_bytes,
               CAST(SUM(nk) * 8 AS BIGINT) AS naive_bytes,
               CAST((SUM(nk) * 8 * 1000000 + SUM(bytes) // 2) // SUM(bytes)
                    AS BIGINT) AS compression_e6
        FROM sized GROUP BY status ORDER BY status
    """,
    tags=("storage", "bitmap", "roaring", "orders"),
)
def bitmap_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roaring-bitmap container plan for the per-status order-key sets:
    keys chunk by high 16 bits; a chunk holds an array container
    (2 bytes/key) when ≤ 4096 keys, else the fixed 8 KiB bitmap — the
    actual container rule of the Roaring format (Lemire et al.). Emits
    the container mix, exact byte totals, and the ratio vs naive
    8-byte keys — the sizing pass a bitmap-index builder runs before
    choosing representations.

    Scale design: one distinct-count rollup keyed (status, chunk) with
    map-side partials; output bounded by |statuses| × |key range/2^16|.
    """
    chunks = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.expr("o_orderkey DIV 65536").alias("chunk"),
        )
        .agg(F.countDistinct("o_orderkey").cast("bigint").alias("nk"))
    )
    sized = chunks.select(
        "status",
        "nk",
        F.when(F.col("nk") <= 4096, 2 * F.col("nk")).otherwise(8192).alias("bytes"),
        F.when(F.col("nk") <= 4096, 1).otherwise(0).alias("is_array"),
    )
    return (
        sized.groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum("is_array").cast("bigint").alias("n_array"),
            (F.count("*") - F.sum("is_array")).cast("bigint").alias("n_bitmap"),
            F.sum("nk").cast("bigint").alias("n_keys"),
            F.sum("bytes").cast("bigint").alias("roaring_bytes"),
            (F.sum("nk") * 8).cast("bigint").alias("naive_bytes"),
            F.call_function(
                "div",
                F.sum("nk") * 8 * 1000000
                + F.call_function("div", F.sum("bytes"), F.lit(2).cast("bigint")),
                F.sum("bytes"),
            )
            .cast("bigint")
            .alias("compression_e6"),
        )
        .orderBy("status")
    )
