"""Pipeline batch 9: embedding dimensionality reduction and weighted
sampling — Johnson-Lindenstrauss random projection (the preprocessing
step that makes 100 TB-scale ANN cheaper: shrink vectors BEFORE the
shuffle-heavy stages) and Efraimidis-Spirakis weighted reservoir
sampling (exact top-k weighted sampling in one pass, the corpus-mixing
primitive when quotas are per-group counts rather than rates).

Reference parity note: none of this exists in the reference (its public
surface is ``mapreduce.h:44-83``); it is the driver-mandated
LLM-pipeline superset.

Cross-engine float discipline (SCALING.md): the JL projection embeds the
SAME literal +-1 sign matrix in plan and oracle (generated from md5 at
import time — a model parameter, like IVF centroids), folds the dot
product left-to-right from an explicit 0.0 seed on both engines, and
scales by 1/4 (exactly representable). Sampling ranks compare libm
``ln`` values but never display them — a rank flip would need two keys
within one ulp, and ties are broken by doc_id.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_JL_IN = 64  # embeddings.embedding dimension
_JL_OUT = 16  # target dimension; scale 1/sqrt(16) = 0.25 is binary-exact


def _jl_signs() -> list[list[float]]:
    """Deterministic +-1.0 sign matrix [out][in], seeded by md5 — the
    Achlioptas/JL database-friendly projection (signs suffice; Gaussian
    entries are unnecessary for the distance-preservation guarantee)."""
    return [
        [
            1.0 if int(hashlib.md5(f"jl_{j}_{i}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1.0
            for i in range(_JL_IN)
        ]
        for j in range(_JL_OUT)
    ]


_SIGNS = _jl_signs()


def _jl_oracle() -> str:
    dims = []
    for j in range(_JL_OUT):
        s = "[" + ", ".join(f"{v:.1f}" for v in _SIGNS[j]) + "]"
        dims.append(
            f"CAST(FLOOR(0.25 * list_reduce(list_prepend(0.0, "
            f"list_transform(range({_JL_IN}), i -> CAST(embedding[i + 1] AS DOUBLE)"
            f" * ({s}::DOUBLE[])[i + 1])), (a, b) -> a + b) * 1000000.0 + 0.5) AS BIGINT)"
        )
    cols = ", ".join(dims)
    return f"""
        SELECT vec_id, label, array_to_string([{cols}], ',') AS proj_e6
        FROM embeddings
    """


@register(
    "jl_random_projection",
    oracle=_jl_oracle(),
    tags=("embedding", "dimensionality-reduction", "similarity", "embeddings"),
)
def jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    deterministic +-1 sign matrix (Achlioptas): pairwise distances are
    preserved within ~1/sqrt(16) relative distortion, so downstream
    ANN/dedup stages run on vectors 4x smaller. At 100 TB this is the
    difference between shuffling 256-byte and 64-byte vectors through
    every LSH/IVF stage.

    Scale design: the sign matrix is a compile-time literal folded into
    whole-stage codegen (in production: a broadcast var) — the projection
    is pure map-side, zero shuffle, and the scan prunes to the three
    needed columns. Fold order, seed 0.0, and the binary-exact 0.25
    scale are identical in plan and oracle, so the grid-quantized
    outputs (_e6 fixed-point BIGINTs, functions/grid.py) are bit-stable
    cross-engine (module docstring).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    from multithreaded_map_reduce_library_spark.functions.grid import grid

    proj = F.array(
        *[
            grid(
                F.lit(0.25)
                * F.aggregate(
                    F.sequence(F.lit(1), F.lit(_JL_IN)),
                    F.lit(0.0),
                    lambda acc, i: acc
                    + F.element_at(e, i).cast("double")
                    * F.element_at(F.array(*[F.lit(v) for v in _SIGNS[j]]), i),
                ),
                6,
            )
            for j in range(_JL_OUT)
        ]
    )
    # CSV, not array: compound oracle outputs are driver-fragile (pandas
    # renders DuckDB LIST as numpy arrays — str() mismatch vs Python lists)
    return emb.select(
        "vec_id",
        "label",
        F.array_join(
            F.transform(proj, lambda x: x.cast("string")), ","
        ).alias("proj_e6"),
    )


_WRS_K = 5  # sample size per language


@register(
    "weighted_reservoir_sample_docs",
    oracle=f"""
        WITH keyed AS (
            SELECT lang, doc_id, n_chars,
                   ln((CAST(('0x' || substr(md5('wrs|' || CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) + 0.5) / 4294967296.0)
                   / CAST(n_chars AS DOUBLE) AS k
            FROM documents WHERE n_chars > 0
        )
        SELECT lang, doc_id, n_chars,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id)
                    AS BIGINT) AS rk
        FROM keyed
        QUALIFY rk <= {_WRS_K}
    """,
    tags=("sampling", "weighted", "corpus", "documents"),
)
def weighted_reservoir_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis-Spirakis A-ES): per
    language, exactly K=5 documents drawn with probability proportional
    to length (n_chars) — the corpus-mixing primitive when the recipe
    says "5 docs per language, length-weighted" rather than a sampling
    rate. Each doc gets key u^(1/w) (compared as ln(u)/w, monotone) with
    u deterministic from md5(doc_id); the K largest keys win.

    Scale design: one pass computes keys map-side; the per-group top-K
    runs TWO-PHASE — a salted pre-top-K over (lang, doc_id%16) bounds
    every reducer at K rows per salt, then the final window ranks only
    16*K survivors per language. The global top-K of the union of
    per-salt top-Ks is exactly the global top-K (any global winner also
    wins its salt), so the answer is identical to the single-window form
    while no reducer ever sorts a whole language — the skew fix for a
    corpus that is 90% one language. The displayed columns are integers
    only; the float key is compared, never shown, and ties break on
    doc_id, so ranks are run- and engine-stable.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("wrs|"), F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        (F.log(u) / F.col("n_chars").cast("double")).alias("k"),
        (F.col("doc_id") % 16).alias("salt"),
    )
    w_pre = Window.partitionBy("lang", "salt").orderBy(F.col("k").desc(), F.col("doc_id"))
    survivors = (
        keyed.withColumn("rk_pre", F.row_number().over(w_pre))
        .filter(F.col("rk_pre") <= _WRS_K)
        .drop("rk_pre", "salt")
    )
    w = Window.partitionBy("lang").orderBy(F.col("k").desc(), F.col("doc_id"))
    return (
        survivors.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _WRS_K)
        .select("lang", "doc_id", "n_chars", "rk")
    )
