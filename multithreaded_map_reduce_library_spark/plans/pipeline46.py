"""Pipeline batch 46: rendezvous (highest-random-weight) sharding with
its minimal-motion guarantee QUANTIFIED, and the train/test near-dup
leakage audit composing the split assignment with the exact
set-similarity join — a distributed-systems primitive and the
contamination check every eval pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_RV_SHARDS_A = 5
_RV_SHARDS_B = 6  # one shard added: only ~1/6 of keys may move


def _hrw_sql(n_shards: int) -> str:
    terms = ", ".join(
        f"""struct_pack(w := CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
             || '|s{i}'), 1, 12)) AS BIGINT), s := {i})"""
        for i in range(n_shards)
    )
    return f"list_sort([{terms}], 'DESC')[1].s"


def _hrw_col(n_shards: int):
    pairs = [
        F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f"|s{i}"))
                    ),
                    1,
                    12,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("w"),
            F.lit(i).alias("s"),
        )
        for i in range(n_shards)
    ]
    return F.sort_array(F.array(*pairs), asc=False)[0]["s"]


@register(
    "rendezvous_shard_assignment",
    oracle=f"""
        WITH a AS (
            SELECT doc_id,
                   {_hrw_sql(_RV_SHARDS_A)} AS shard_5,
                   {_hrw_sql(_RV_SHARDS_B)} AS shard_6
            FROM documents
        )
        SELECT shard_6 AS shard,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE shard_5 <> shard_6) AS n_moved
        FROM a GROUP BY shard
    """,
    tags=("layout", "sharding", "rendezvous", "documents"),
)
def rendezvous_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    1996): each document goes to the shard whose md5(doc || shard)
    weight is highest — when a 6th shard is added, ONLY documents whose
    new shard wins move (every mover lands on the new shard 5, and in
    expectation just 1/6 of keys move — the consistent-hashing
    guarantee, unlike mod-N which reshuffles ~all). Output quantifies
    it: per shard-of-6, document count and how many arrived by moving.

    Scale design: pure map-side expression (N md5 calls per row, in
    whole-stage codegen) + a 6-row rollup. This is the assignment
    function a 100 TB writer uses so cluster resizes re-copy 1/N of
    the data, not all of it.
    """
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id",
        _hrw_col(_RV_SHARDS_A).alias("shard_5"),
        _hrw_col(_RV_SHARDS_B).alias("shard_6"),
    )
    return a.groupBy(F.col("shard_6").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("shard_5") != F.col("shard_6"), 1)).alias("n_moved"),
    )


_LK_T_NUM = 4
_LK_T_DEN = 5


@register(
    "split_leakage_audit",
    oracle=f"""
        WITH s AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       list_filter(string_split_regex(text, '[ \t\r\n]'),
                                   t -> t <> ''), t -> lower(t))) AS toks,
                   CASE WHEN CAST(('0x' || substr(md5('split|' ||
                                  CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                             % 100 < 96 THEN 'train'
                        WHEN CAST(('0x' || substr(md5('split|' ||
                                  CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                             % 100 < 98 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        ),
        p AS (
            SELECT least(a.split, b.split) AS split_a,
                   greatest(a.split, b.split) AS split_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE {_LK_T_DEN} * len(list_intersect(a.toks, b.toks))
                  >= {_LK_T_NUM} * (len(a.toks) + len(b.toks)
                                    - len(list_intersect(a.toks, b.toks)))
        )
        SELECT split_a, split_b, COUNT(*) AS n_neardup_pairs
        FROM p GROUP BY split_a, split_b
    """,
    tags=("evaluation", "leakage", "dedup", "split", "documents"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: near-duplicate pairs (exact Jaccard >=
    4/5 on token sets, the prefix_filter_jaccard_join relation) counted
    by which splits of the content-addressed 96/2/2 assignment
    (`dataset_split_assignment`) the two documents landed in — any
    train-test or train-val row is eval contamination that decon
    pipelines must quarantine BEFORE training. Composes two existing
    operators end to end; the oracle replays both.

    Scale design: the pair side reuses the prefix-filtered candidate
    generation (rare-token inverted index, never all-pairs); the split
    is a map-side hash; the report is a <=6-row rollup.
    """
    from multithreaded_map_reduce_library_spark.plans.pipeline28 import (
        prefix_filter_jaccard_join,
    )

    pairs = prefix_filter_jaccard_join(spark, sf_dir).select("id_a", "id_b")

    def split_col(doc_col):
        b = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split|"), F.col(doc_col).cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("bigint")
            % 100
        )
        return F.when(b < 96, "train").when(b < 98, "val").otherwise("test")

    tagged = pairs.select(
        split_col("id_a").alias("sa"), split_col("id_b").alias("sb")
    ).select(
        F.least("sa", "sb").alias("split_a"),
        F.greatest("sa", "sb").alias("split_b"),
    )
    return tagged.groupBy("split_a", "split_b").agg(
        F.count("*").alias("n_neardup_pairs")
    )
