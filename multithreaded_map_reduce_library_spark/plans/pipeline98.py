"""Pipeline batch 98 (round 4): NDCG + DICTIONARY ENCODING + HODGES-
LEHMANN — completing three tiers:

* ``ndcg_at_k_ranking`` — NDCG@10 of each user's value-ordered event
  ranking against graded relevance (purchase=3, signup=2, click=1 →
  gains 2^rel−1), mean over users with at least one relevant event.
  Completes the ranking-metric tier (AUC / AP / MRR in pipeline91).
* ``dictionary_encoding_audit`` — exact dictionary-encoding size model
  for the three low-cardinality string columns (event_type, lang,
  source): distinct count, ceil(log2 n) bits per code, dictionary and
  payload bytes, compression ratio. Joins the varint / RLE / zone-map /
  compaction storage-audit family.
* ``hodges_lehmann_daily`` — the Hodges-Lehmann location estimator of
  daily revenue: the median of all pairwise Walsh averages
  (x_i+x_j)/2, i ≤ j — kept exact by working with 4×HL (the sum of the
  two middle doubled-averages). The robust-location tier's missing
  member next to Huber (``huber_location_daily``), MAD, and Theil-Sen.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
none of these tiers; they extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import duck_int_ratio, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_K = 10
_REL = "CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2 WHEN 'click' THEN 1 ELSE 0 END"


@register(
    "ndcg_at_k_ranking",
    oracle=f"""
        WITH g AS (
            SELECT user_id, event_id, value,
                   CAST(POWER(2, {_REL}) - 1 AS BIGINT) AS gain
            FROM events
        ),
        ranked AS (
            SELECT user_id, gain,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY value DESC NULLS LAST, event_id) AS BIGINT) AS rn,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY gain DESC, event_id) AS BIGINT) AS ideal_rn
            FROM g
        ),
        peruser AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN rn <= {_K} THEN
                       CAST(FLOOR(CAST(gain AS DOUBLE) / log2(CAST(rn + 1 AS DOUBLE))
                                  * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS dcg_e9,
                   CAST(SUM(CASE WHEN ideal_rn <= {_K} THEN
                       CAST(FLOOR(CAST(gain AS DOUBLE) / log2(CAST(ideal_rn + 1 AS DOUBLE))
                                  * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS idcg_e9
            FROM ranked GROUP BY user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               {duck_int_ratio("SUM(" + duck_int_ratio("dcg_e9", "idcg_e9", 6) + ")", "COUNT(*)", 0)} AS mean_ndcg_e6,
               CAST(MIN({duck_int_ratio("dcg_e9", "idcg_e9", 6)}) AS BIGINT) AS min_ndcg_e6,
               CAST(MAX({duck_int_ratio("dcg_e9", "idcg_e9", 6)}) AS BIGINT) AS max_ndcg_e6
        FROM peruser WHERE idcg_e9 > 0
    """,
    tags=("evaluation", "ranking", "ndcg", "events"),
)
def ndcg_at_k_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of each user's (value DESC NULLS LAST, event_id) event
    ranking with graded relevance gains 2^rel−1 (purchase 7, signup 3,
    click 1, else 0): per-rank terms gain/log2(rank+1) are e9-grid
    integers, DCG and the ideal DCG (same gains, gain-sorted) are
    integer sums, each user's NDCG is an exact half-up e6 ratio, and
    the corpus mean/min/max are exact integer aggregates over users
    with at least one relevant event (the standard exclusion — IDCG=0
    makes NDCG undefined).

    Scale design: two user-partitioned windows on one fact pass, a
    user rollup, and a grand aggregate — no global sort anywhere."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "user_id",
        "event_id",
        "value",
        (F.pow(F.lit(2.0), F.expr(_REL)) - 1).cast("bigint").alias("gain"),
    )
    wv = Window.partitionBy("user_id").orderBy(F.desc_nulls_last("value"), F.asc("event_id"))
    wi = Window.partitionBy("user_id").orderBy(F.desc("gain"), F.asc("event_id"))
    ranked = g.select(
        "user_id",
        "gain",
        F.row_number().over(wv).cast("bigint").alias("rn"),
        F.row_number().over(wi).cast("bigint").alias("ideal_rn"),
    )

    def term(rank_col: str) -> F.Column:
        return F.when(
            F.col(rank_col) <= _K,
            F.floor(
                F.col("gain").cast("double")
                / F.log2((F.col(rank_col) + 1).cast("double"))
                * 1000000000.0
                + F.lit(0.5)
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))

    peruser = ranked.groupBy("user_id").agg(
        F.sum(term("rn")).cast("bigint").alias("dcg_e9"),
        F.sum(term("ideal_rn")).cast("bigint").alias("idcg_e9"),
    )
    ndcg = int_ratio(F.col("dcg_e9"), F.col("idcg_e9"), 6)
    return (
        peruser.where(F.col("idcg_e9") > 0)
        .select(ndcg.alias("ndcg_e6"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            int_ratio(F.sum("ndcg_e6"), F.count("*"), 0).alias("mean_ndcg_e6"),
            F.min("ndcg_e6").cast("bigint").alias("min_ndcg_e6"),
            F.max("ndcg_e6").cast("bigint").alias("max_ndcg_e6"),
        )
    )


def _dict_leg_sql(col: str, table: str) -> str:
    return f"""
        SELECT '{table}.{col}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(GREATEST(1, CEIL(log2(CAST(COUNT(DISTINCT {col}) AS DOUBLE)))) AS BIGINT) AS bits_per_code,
               CAST(SUM(len({col})) AS BIGINT) AS raw_bytes
        FROM {table} WHERE {col} IS NOT NULL"""


def _dict_leg_spark(df: DataFrame, col: str, table: str) -> DataFrame:
    nd = F.count_distinct(F.col(col))
    return df.where(F.col(col).isNotNull()).agg(
        F.lit(f"{table}.{col}").alias("column_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        nd.cast("bigint").alias("n_distinct"),
        F.greatest(F.lit(1).cast("bigint"), F.ceil(F.log2(nd.cast("double"))).cast("bigint")).alias(
            "bits_per_code"
        ),
        F.sum(F.length(col)).cast("bigint").alias("raw_bytes"),
    )


@register(
    "dictionary_encoding_audit",
    oracle=f"""
        WITH legs AS (
            {_dict_leg_sql("event_type", "events")}
            UNION ALL
            {_dict_leg_sql("lang", "documents")}
            UNION ALL
            {_dict_leg_sql("source", "documents")}
        ),
        dicts AS (
            SELECT 'events.event_type' AS column_name,
                   CAST(SUM(len(v) + 4) AS BIGINT) AS dict_bytes
            FROM (SELECT DISTINCT event_type AS v FROM events WHERE event_type IS NOT NULL)
            UNION ALL
            SELECT 'documents.lang', CAST(SUM(len(v) + 4) AS BIGINT)
            FROM (SELECT DISTINCT lang AS v FROM documents WHERE lang IS NOT NULL)
            UNION ALL
            SELECT 'documents.source', CAST(SUM(len(v) + 4) AS BIGINT)
            FROM (SELECT DISTINCT source AS v FROM documents WHERE source IS NOT NULL)
        )
        SELECT l.column_name, l.n_rows, l.n_distinct, l.bits_per_code, l.raw_bytes,
               d.dict_bytes,
               CAST((l.n_rows * l.bits_per_code + 7) // 8 AS BIGINT) AS payload_bytes,
               {duck_int_ratio("l.raw_bytes", "(l.n_rows * l.bits_per_code + 7) // 8 + d.dict_bytes", 6)} AS compression_e6
        FROM legs l JOIN dicts d USING (column_name)
    """,
    tags=("storage", "dictionary-encoding", "audit", "events", "documents"),
)
def dictionary_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dictionary-encoding size model for the three low-cardinality
    string columns: per column the row count, distinct count,
    ceil(log2 n_distinct) bits per code (min 1), raw character bytes,
    dictionary bytes (value chars + a 4-byte offset each), bit-packed
    payload bytes, and the exact e6 compression ratio raw/(payload+dict).
    The storage-tier sizing audit next to varint postings, RLE runs,
    zone maps, and compaction — the numbers that justify dictionary
    encoding before a 100 TB rewrite.

    Scale design: one aggregate pass per column (count-distinct is the
    only shuffle; the dictionary leg reuses the distinct set). log2 of
    an exact small integer is correctly rounded in both engines, and
    everything else is integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    legs = (
        _dict_leg_spark(ev, "event_type", "events")
        .unionAll(_dict_leg_spark(docs, "lang", "documents"))
        .unionAll(_dict_leg_spark(docs, "source", "documents"))
    )

    def dict_leg(df: DataFrame, col: str, table: str) -> DataFrame:
        return (
            df.where(F.col(col).isNotNull())
            .select(F.col(col).alias("v"))
            .distinct()
            .agg(
                F.lit(f"{table}.{col}").alias("column_name"),
                F.sum(F.length("v") + 4).cast("bigint").alias("dict_bytes"),
            )
        )

    dicts = (
        dict_leg(ev, "event_type", "events")
        .unionAll(dict_leg(docs, "lang", "documents"))
        .unionAll(dict_leg(docs, "source", "documents"))
    )
    payload = F.call_function(
        "div", F.col("n_rows") * F.col("bits_per_code") + 7, F.lit(8).cast("bigint")
    )
    return legs.join(dicts, "column_name").select(
        "column_name",
        "n_rows",
        "n_distinct",
        "bits_per_code",
        "raw_bytes",
        "dict_bytes",
        payload.cast("bigint").alias("payload_bytes"),
        int_ratio(F.col("raw_bytes"), payload + F.col("dict_bytes"), 6).alias(
            "compression_e6"
        ),
    )


@register(
    "hodges_lehmann_daily",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1
        ),
        walsh AS (
            SELECT a.cents + b.cents AS w
            FROM daily a JOIN daily b ON a.day <= b.day
        ),
        ranked AS (
            SELECT w,
                   CAST(ROW_NUMBER() OVER (ORDER BY w) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM walsh
        )
        SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
               MAX(m) AS n_pairs,
               CAST(SUM(CASE WHEN rn = (m + 1) // 2 THEN w ELSE 0 END)
                  + SUM(CASE WHEN rn = (m + 2) // 2 THEN w ELSE 0 END) AS BIGINT) AS hl_x4_cents
        FROM ranked
    """,
    tags=("statistics", "robust", "hodges-lehmann", "events", "global-sort"),
)
def hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimator of daily purchase revenue: the
    median of all n(n+1)/2 pairwise Walsh averages (x_i+x_j)/2, i ≤ j —
    the robust, 86%-efficient estimator between the mean and the
    median. Kept exact by emitting 4×HL in cents: Walsh sums x_i+x_j
    (2× the average) and the median as the sum of the two middle order
    statistics (equal for odd counts). Completes the robust-location
    family: Huber (huber_location_daily), MAD, Theil-Sen.

    Scale design: the O(days²) Walsh self-join runs on the day rollup
    (Mann-Kendall precedent), never the fact table; the order-statistic
    window runs on that pair relation."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint()
    )
    a = daily.select(F.col("day").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("cents").alias("cb"))
    walsh = a.join(F.broadcast(b), F.col("da") <= F.col("db")).select(
        (F.col("ca") + F.col("cb")).alias("w")
    )
    wr = Window.orderBy("w")
    wall = Window.orderBy("w").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = walsh.select(
        "w",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.count("*").over(wall).cast("bigint").alias("m"),
    )
    idiv = lambda x, d: F.call_function("div", x, F.lit(d).cast("bigint"))  # noqa: E731
    n_days = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    hl = ranked.agg(
        F.max("m").alias("n_pairs"),
        (
            F.sum(F.when(F.col("rn") == idiv(F.col("m") + 1, 2), F.col("w")).otherwise(0))
            + F.sum(F.when(F.col("rn") == idiv(F.col("m") + 2, 2), F.col("w")).otherwise(0))
        )
        .cast("bigint")
        .alias("hl_x4_cents"),
    )
    return n_days.crossJoin(F.broadcast(hl)).select("n_days", "n_pairs", "hl_x4_cents")
