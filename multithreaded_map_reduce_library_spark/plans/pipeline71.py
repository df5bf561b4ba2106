"""Pipeline batch 71: INCREMENTAL dedup — the recurring-crawl shape.

Production corpora are not deduplicated once; every new crawl batch is
checked against the standing corpus INDEX (band keys), not against the
raw corpus. This query splits documents content-addressably into an
"existing corpus" (~80%) and a "new batch" (~20%), builds the LSH
band-key index over the existing side, and flags each new document by
how many of its band keys collide with the index — novel documents
(zero collisions) enter the corpus, suspects go to the exact-verify
queue. Only the NEW batch is sketched per increment at scale; the index
is the persisted band table keyed for the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

#: content-addressed batch split: md5 first hex digit < 'd' -> existing
#: (13/16 ~ 81%), else new batch — deterministic, engine-identical.
_SPLIT = "substr(md5('inc-' || CAST(doc_id AS VARCHAR)), 1, 1) < 'd'"


def _inc_oracle() -> str:
    from multithreaded_map_reduce_library_spark.plans.pipeline import (
        _duck_band_exprs,
        _duck_minhash_sig_cte,
    )

    return f"""
        WITH {_duck_minhash_sig_cte()},
        bands AS (SELECT doc_id, unnest({_duck_band_exprs()}) AS band_key FROM sig),
        existing AS (SELECT DISTINCT band_key
                     FROM bands WHERE {_SPLIT}),
        -- DISTINCT matches the Spark side's banded .distinct(): a doc
        -- whose two bands render the same key contributes it once
        newb AS (SELECT DISTINCT doc_id, band_key
                 FROM bands WHERE NOT ({_SPLIT}))
        SELECT n.doc_id,
               CAST(COUNT(e.band_key) AS BIGINT) AS n_colliding_bands,
               CAST(CASE WHEN COUNT(e.band_key) = 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS is_novel
        FROM newb n LEFT JOIN existing e USING (band_key)
        GROUP BY n.doc_id
    """


@register(
    "incremental_dedup_new_docs",
    oracle=_inc_oracle(),
    tags=("dedup", "minhash", "incremental", "index"),
)
def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening of a new crawl batch against the
    standing corpus's LSH band-key index: per new document, the number
    of its 4 band keys already present in the index, and the novelty
    flag (0 collisions). The 80/20 split is content-addressed
    (md5(doc_id)), so the partition — and therefore the result — is a
    pure function of the corpus.

    Scale design: the index side reduces to DISTINCT band keys (the
    persisted index table in production — far smaller than the corpus);
    the new batch is the only side sketched per increment; the
    collision check is one equi-join on band_key followed by a per-doc
    aggregate. Nothing rescans the existing corpus text."""
    from multithreaded_map_reduce_library_spark.operators.dedup import (
        minhash_banded,
    )

    docs = load_table(spark, sf_dir, "documents")
    split = F.expr(_SPLIT.replace("VARCHAR", "STRING"))
    banded = minhash_banded(docs, num_hashes=16, bands=4, shingle_n=3)
    sides = banded.join(
        docs.select(F.col("doc_id").alias("doc"), split.alias("_e")), "doc"
    )
    existing = (
        sides.filter(F.col("_e")).select("band_key").distinct()
        .withColumn("_hit", F.lit(1))
    )
    newb = sides.filter(~F.col("_e")).select(
        F.col("doc").alias("doc_id"), "band_key"
    )
    return (
        newb.join(existing, "band_key", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_colliding_bands"),
        )
        .select(
            "doc_id",
            "n_colliding_bands",
            F.when(F.col("n_colliding_bands") == 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_novel"),
        )
    )
