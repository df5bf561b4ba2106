"""Pipeline batch 68: training-order curriculum construction and
Merkle-style per-shard dataset digests.

* ``curriculum_order_docs`` — curriculum learning order: documents
  bucket into quality quartiles (best first), and within each shard the
  read order is (quality bucket asc, salt-keyed md5) — the standard
  easy/clean-first curriculum with a deterministic within-bucket
  shuffle, built entirely shard-parallel (no global sort).
* ``merkle_shard_roots`` — the per-shard refinement of pipeline59's
  whole-corpus `corpus_content_signature`: each of 16 content-addressed
  shards gets an order-invariant 48-bit digest, plus each shard's row
  count and byte total. Two corpus versions diff in O(changed shards)
  instead of "the one global signature changed, rescan everything" —
  the Merkle-tree idea data catalogs use for incremental verification.

Float discipline: quality_e4 reuses the doc_quality_score grid
expression; everything else is exact integer/string arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_POW48 = 1 << 48


def _curriculum_oracle() -> str:
    from multithreaded_map_reduce_library_spark.plans.pipeline import (
        _duck_quality_sql,
    )

    quality = _duck_quality_sql().strip()
    return f"""
        WITH q AS ({quality}),
        b AS (SELECT doc_id, quality_e4,
                     NTILE(4) OVER (ORDER BY quality_e4 DESC, doc_id) AS bucket,
                     md5('cur-' || CAST(doc_id AS VARCHAR)) AS hx
              FROM q)
        SELECT doc_id, quality_e4,
               CAST(bucket AS BIGINT) AS bucket,
               CAST(instr('0123456789abcdef', substr(hx, 2, 1)) - 1 AS BIGINT)
                   AS shard,
               ROW_NUMBER() OVER (PARTITION BY substr(hx, 2, 1)
                                  ORDER BY bucket, hx, doc_id) AS pos
        FROM b
    """


@register(
    "curriculum_order_docs",
    oracle=_curriculum_oracle(),
    # "ntile": the quartile cut is the one narrow global window the
    # curriculum needs (2 ints/doc; quantile-sketch at 100 TB) — the
    # audit's documented global-window exemption class.
    tags=("corpus", "curriculum", "ordering", "quality", "ntile"),
)
def curriculum_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: quality quartile first (NTILE(4) over
    quality_e4 desc — bucket 1 is the cleanest quarter), then a
    deterministic salt-keyed md5 shuffle within the bucket, laid out in
    16 content-addressed shards whose within-shard ``pos`` is the read
    order (readers interleave shards round-robin, preserving the
    bucket-major curriculum in expectation). The standard
    clean-data-first curriculum, as a pure function of (seed, corpus).

    Scale design: the quality expression and shard key are map-side;
    NTILE runs on the (doc_id, quality) pairs — the one narrow global
    window this operator fundamentally needs (its input is 2 ints/doc,
    not the corpus; at 100 TB the equivalent is a quantile-sketch cut
    into quartiles) — and the read order sorts PER SHARD in parallel,
    exactly like `training_shuffle_order`. No global sort of documents
    anywhere."""
    from multithreaded_map_reduce_library_spark.operators.textstats import (
        quality_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        F.floor(quality_score(F.col("text")) * F.lit(10000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("quality_e4"),
    )
    b = q.select(
        "doc_id",
        "quality_e4",
        F.ntile(4)
        .over(Window.partitionBy().orderBy(F.desc("quality_e4"), F.asc("doc_id")))
        .alias("bucket"),
        F.md5(F.concat(F.lit("cur-"), F.col("doc_id").cast("string"))).alias("hx"),
    ).withColumn("hexd", F.substring("hx", 2, 1))
    w = Window.partitionBy("hexd").orderBy("bucket", "hx", "doc_id")
    return b.select(
        "doc_id",
        "quality_e4",
        F.col("bucket").cast("bigint").alias("bucket"),
        (F.expr("instr('0123456789abcdef', hexd)") - 1).cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


@register(
    "merkle_shard_roots",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   CAST(instr('0123456789abcdef',
                              substr(md5('42-' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1
                        AS BIGINT) AS shard,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),
                                        1, 12)) AS BIGINT) AS ch,
                   octet_length(encode(text)) AS nb
            FROM documents
        )
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nb) AS BIGINT) AS n_bytes,
               CAST(SUM(ch) % {_POW48} AS BIGINT) AS shard_sig
        FROM h GROUP BY shard
    """,
    tags=("data-quality", "signature", "versioning", "merkle", "documents"),
)
def merkle_shard_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard dataset digests: documents route to 16 shards by the
    SAME salt-keyed md5 digit as `training_shuffle_order`, and each
    shard reports row count, byte total, and an order-invariant 48-bit
    content digest (sum of per-doc content hashes mod 2^48 — the
    pipeline59 signature, refined per shard). Diffing two corpus
    versions now touches only the shards whose digest changed — the
    Merkle-style incremental-verification layout; the whole-corpus
    signature is recoverable as the sum of shard digests mod 2^48.

    Overflow design (same as pipeline59): 48-bit terms sum in
    DECIMAL(38,0), modulus at the end — exact at any shard size,
    no int64 overflow in Spark's ANSI mode.

    Scale design: one map-side hash pair per row, one 16-group
    aggregate with map-side combine. The digest table is 16 rows no
    matter the corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.expr(
            "instr('0123456789abcdef', "
            "substring(md5(concat('42-', cast(doc_id as string))), 2, 1))"
        )
        - 1
    ).cast("long")
    ch = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.select(
            shard.alias("shard"),
            ch.alias("ch"),
            F.length(F.encode("text", "utf-8")).alias("nb"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nb").cast("bigint").alias("n_bytes"),
            (
                F.sum(F.col("ch").cast("decimal(38,0)"))
                % F.lit(_POW48).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("shard_sig"),
        )
    )
