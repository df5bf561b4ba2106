"""Pipeline batch 94 (round 4): DATA VALUATION + FEATURE HASHING — two
training-data-curation primitives:

* ``knn_shapley_valuation`` — exact closed-form KNN-Shapley values
  (Jia et al., VLDB 2019: for a K-NN classifier the Shapley value of
  every training point has an O(N log N) recurrence — no Monte Carlo):
  per test point, sort training points by similarity; then
  ``s_N = 1[y_N = y] / N`` and
  ``s_i = s_{i+1} + (1[y_i=y] - 1[y_{i+1}=y]) / K * min(K,i) / i``.
  The per-step increments are quantized to e9 integers (integer
  division truncating toward zero — identical in both engines), so the
  suffix cumulative sum and the per-training-point total are exact
  integer arithmetic end to end. The ranking this valuation curates by
  is what a pipeline uses to drop harmful or mislabeled training docs.
* ``feature_hash_collision_audit`` — the hashing-trick health check:
  bucket the corpus vocabulary through the repo's engine-independent
  md5-32 hash into 4096 feature buckets and report vocabulary size,
  buckets used, colliding-token mass, max bucket load, and the exact
  collision/load ratios. Run before trusting hashed features at scale.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
valuation tier; these extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import (
    duck_int_ratio,
    int_ratio,
)
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_DIM = 64
_K = 3  # the KNN classifier being valued
_TEST_MOD = 20  # vec_id % 20 == 0 -> held-out test point
_TEST_CAP = 64  # constant broadcast bound: first 64 test ids by vec_id
_SCALE = 10**9

_N_BUCKETS = 4096


def _dot(a: str, b: str) -> str:
    return " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, _DIM + 1))


def _h32(var: str) -> str:
    """First 8 hex digits of md5 as BIGINT — DuckDB twin of
    ``F.conv(F.substring(F.md5(x), 1, 8), 16, 10)`` (the engine-independent
    hash family used by every sketch oracle in this repo)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({var}), {p}, 1)) - 1) * {16 ** (8 - p)}"
        for p in range(1, 9)
    )
    return f"({terms})"


@register(
    "knn_shapley_valuation",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv, label AS q_lbl
            FROM embeddings WHERE vec_id % {_TEST_MOD} = 0
            ORDER BY vec_id LIMIT {_TEST_CAP}
        ),
        t AS (
            SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv, label AS n_lbl
            FROM embeddings WHERE vec_id % {_TEST_MOD} <> 0
        ),
        s AS (
            SELECT q_id, n_id,
                   CASE WHEN n_lbl = q_lbl THEN 1 ELSE 0 END AS m,
                   ({_dot("qv", "nv")}) / (sqrt({_dot("qv", "qv")}) * sqrt({_dot("nv", "nv")})) AS sim
            FROM q, t
        ),
        r AS (
            SELECT q_id, n_id, m,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS i,
                   CAST(COUNT(*) OVER (PARTITION BY q_id) AS BIGINT) AS nn,
                   LEAD(m) OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS m_next
            FROM s
        ),
        inc AS (
            SELECT q_id, n_id, i,
                   CASE WHEN m_next IS NULL THEN (m * {_SCALE}) // nn
                        ELSE ((m - m_next) * LEAST({_K}, i) * {_SCALE}) // ({_K} * i)
                   END AS t_inc
            FROM r
        ),
        sv AS (
            SELECT q_id, n_id,
                   CAST(SUM(t_inc) OVER (PARTITION BY q_id ORDER BY i DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_e9
            FROM inc
        )
        SELECT n_id AS train_id,
               CAST(COUNT(*) AS BIGINT) AS n_tests,
               CAST(SUM(s_e9) AS BIGINT) AS shapley_sum_e9
        FROM sv GROUP BY n_id
    """,
    tags=("valuation", "shapley", "knn", "embeddings"),
    bench=True,
)
def knn_shapley_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact closed-form KNN-Shapley value of every training embedding for
    a K=3 nearest-neighbor classifier, summed over a deterministic
    held-out test set: the first 64 ids of the 5% split
    (vec_id % 20 == 0, ORDER BY vec_id LIMIT 64). Increments are
    e9-quantized integers (truncate-toward-zero division, identical both
    engines), so the suffix-sum recurrence and the per-point totals are
    exact integer arithmetic; the ranking is the data-valuation signal a
    curation pipeline drops low-value / mislabeled points by.

    Scale design (round-5 bound, VERDICT r4 item 3): the broadcast side
    is CAPPED at a constant 64 test points (``TakeOrderedAndProject`` by
    vec_id — deterministic), so its cardinality is independent of corpus
    size; the training corpus never shuffles for scoring (the
    knn_bruteforce plan shape) and the rank/suffix-sum windows partition
    by test point. To value against a *wider* test set at 100 TB, run
    the same recurrence per capped batch, or compose IVF/LSH candidate
    pruning (ann_ivf_cosine) in front — beyond the K-th neighbor the
    increments decay as 1/i."""
    from multithreaded_map_reduce_library_spark.functions.arrowdist import (
        first_row_rider,
        pack_rows,
        pairwise_cosine_batches,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.where(F.col("vec_id") % _TEST_MOD == 0)
        .orderBy("vec_id")
        .limit(_TEST_CAP)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qv"),
            F.col("label").alias("q_lbl"),
        )
    )
    t = emb.where(F.col("vec_id") % _TEST_MOD != 0).select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("nv"),
        F.col("label").alias("n_lbl"),
    )
    # Round-10 (guide §4.1/§4.2, VERDICT r9 item 4): the 64xN similarity
    # pass is a NARROW mapInArrow batched numpy kernel — the capped test
    # set rides to each task once via the first-row rider instead of the
    # crossJoin materializing 64 interpreted HOF dot-folds per training
    # row; sims are bit-identical (exact float32->float64 casts,
    # left-to-right folds, correctly-rounded sqrt/div — see
    # functions/arrowdist.py). The rank/suffix-sum windows downstream are
    # unchanged, as is every emitted value.
    packed = pack_rows(q, "q_id", "qv", "q_lbl", alias="_q")
    s = (
        t.crossJoin(F.broadcast(packed))
        .select("n_id", "nv", "n_lbl", first_row_rider("_q").alias("_q"))
        .mapInArrow(
            pairwise_cosine_batches,
            schema="q_id bigint, n_id bigint, m int, sim double",
        )
    )
    order = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    part = Window.partitionBy("q_id")
    r = s.select(
        "q_id",
        "n_id",
        "m",
        F.row_number().over(order).cast("bigint").alias("i"),
        F.count("*").over(part).cast("bigint").alias("nn"),
        F.lead("m").over(order).alias("m_next"),
    )
    idiv = lambda a, b: F.call_function("div", a, b)  # noqa: E731
    t_inc = F.when(
        F.col("m_next").isNull(), idiv(F.col("m") * F.lit(_SCALE), F.col("nn"))
    ).otherwise(
        idiv(
            (F.col("m") - F.col("m_next")) * F.least(F.lit(_K), F.col("i")) * F.lit(_SCALE),
            F.lit(_K) * F.col("i"),
        )
    )
    inc = r.select("q_id", "n_id", "i", t_inc.alias("t_inc"))
    suffix = (
        Window.partitionBy("q_id")
        .orderBy(F.desc("i"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sv = inc.select(
        "q_id", "n_id", F.sum("t_inc").over(suffix).cast("bigint").alias("s_e9")
    )
    return sv.groupBy(F.col("n_id").alias("train_id")).agg(
        F.count("*").cast("bigint").alias("n_tests"),
        F.sum("s_e9").cast("bigint").alias("shapley_sum_e9"),
    )


@register(
    "feature_hash_collision_audit",
    oracle=f"""
        WITH vocab AS (
            SELECT DISTINCT tok
            FROM documents,
                 UNNEST(list_filter(string_split_regex(text, '[ \t\r\n]'), t -> t <> '')) AS u(tok)
        ),
        bk AS (
            SELECT {_h32("tok")} % {_N_BUCKETS} AS bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM vocab GROUP BY 1
        )
        SELECT CAST(SUM(n) AS BIGINT) AS vocab_size,
               CAST(COUNT(*) AS BIGINT) AS buckets_used,
               CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS colliding_tokens,
               CAST(MAX(n) AS BIGINT) AS max_bucket_load,
               {duck_int_ratio("SUM(n) - COUNT(*)", "SUM(n)", 6)} AS collision_rate_e6,
               {duck_int_ratio("SUM(n)", str(_N_BUCKETS), 6)} AS load_factor_e6
        FROM bk
    """,
    tags=("features", "hashing", "audit", "documents"),
)
def feature_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit: the corpus vocabulary (reference
    whitespace tokenizer, distwc.c:15-18) hashed through the repo's
    engine-independent md5-32 into 4096 feature buckets. Reports exact
    vocabulary size, buckets used, tokens sharing a bucket, the max
    bucket load, the collision rate (excess tokens per token), and the
    load factor — the numbers that decide whether a hashed feature
    space is large enough before a 100 TB featurization run.

    Scale design: tokenize + distinct is the wordcount shuffle; the
    bucket rollup is at most 4096 rows; the audit is a grand aggregate.
    No window functions, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    from multithreaded_map_reduce_library_spark.functions.text import tokens

    vocab = docs.select(F.explode(tokens("text")).alias("tok")).distinct()
    h32 = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
    bk = vocab.groupBy((h32 % _N_BUCKETS).alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    excess = F.sum("n") - F.count("*")
    return bk.agg(
        F.sum("n").cast("bigint").alias("vocab_size"),
        F.count("*").cast("bigint").alias("buckets_used"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("colliding_tokens"),
        F.max("n").cast("bigint").alias("max_bucket_load"),
        int_ratio(excess, F.sum("n"), 6).alias("collision_rate_e6"),
        int_ratio(F.sum("n"), F.lit(_N_BUCKETS), 6).alias("load_factor_e6"),
    )
