from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multithreaded_map_reduce_library_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signature,
    shingle_hashes,
    simhash_bits,
    simhash_pandas_udf,
)
from multithreaded_map_reduce_library_spark.functions.text import word_shingles


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again today"),
        (1, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near-dup of 0
        (2, "completely different text about spark catalyst optimizer internals"),
        (3, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    groups = {r["keep_id"]: r["n_copies"] for r in exact_dedup_groups(docs).collect()}
    assert groups[0] == 2  # docs 0 and 3 collapse
    assert groups[1] == 1 and groups[2] == 1


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sig = minhash_signature(shingle_hashes(word_shingles("text", 3)), 16)
    out = {r["doc_id"]: tuple(r["s"]) for r in docs.select("doc_id", sig.alias("s")).collect()}
    assert out[0] == out[3]
    assert out[0] != out[2]


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, shingle_n=3).collect()}
    assert (0, 3) in pairs  # exact dup always collides
    assert (0, 1) in pairs or (1, 3) in pairs  # near-dup should band-collide
    assert (0, 2) not in pairs


def test_fused_shingle_hash_equals_twostep(spark, docs):
    """word_shingle_hash32 (fused build+hash) must equal hashing the
    word_shingles output — same md5-prefix ints, same order."""
    from multithreaded_map_reduce_library_spark.functions.text import (
        tokens,
        word_shingle_hash32,
    )

    with_t = docs.select("doc_id", tokens("text").alias("_t"))
    fused = {
        r["doc_id"]: r["h"]
        for r in with_t.select("doc_id", word_shingle_hash32(F.col("_t"), 3).alias("h")).collect()
    }
    with_sh = docs.select("doc_id", word_shingles("text", 3).alias("_sh"))
    twostep = {
        r["doc_id"]: r["h"]
        for r in with_sh.select("doc_id", shingle_hashes(F.col("_sh")).alias("h")).collect()
    }
    assert fused == twostep


def test_shingle_hash_udf_equals_expression(spark, docs):
    """The Arrow pandas-UDF shingle hasher must be bit-identical to the
    JVM expression form — it backs the oracle-checked minhash queries."""
    from multithreaded_map_reduce_library_spark.functions.text import (
        shingle_hash32_pandas_udf,
        tokens,
        word_shingle_hash32,
    )

    with_t = docs.select("doc_id", tokens("text").alias("_t"))
    expr = {
        r["doc_id"]: r["h"]
        for r in with_t.select("doc_id", word_shingle_hash32(F.col("_t"), 3).alias("h")).collect()
    }
    udf = shingle_hash32_pandas_udf(3)
    via_udf = {
        r["doc_id"]: r["h"] for r in docs.select("doc_id", udf("text").alias("h")).collect()
    }
    assert expr == via_udf


def test_band_keys_udf_equals_expression_pipeline(spark, docs):
    """The fused band-key UDF must equal shingle_hash32 -> signature ->
    lsh_band_keys composed as expressions — it backs the oracle-checked
    minhash_lsh_candidates query."""
    from multithreaded_map_reduce_library_spark.functions.text import (
        tokens,
        word_shingle_hash32,
    )
    from multithreaded_map_reduce_library_spark.operators.dedup import (
        lsh_band_keys,
        minhash_band_keys_pandas_udf,
    )

    with_t = docs.select("doc_id", tokens("text").alias("_t"))
    with_h = with_t.select("doc_id", word_shingle_hash32(F.col("_t"), 3).alias("_h"))
    with_sig = with_h.select("doc_id", minhash_signature(F.col("_h"), 16).alias("_sig"))
    expr = {
        r["doc_id"]: r["k"]
        for r in with_sig.select("doc_id", lsh_band_keys(F.col("_sig"), 4, 4).alias("k")).collect()
    }
    udf = minhash_band_keys_pandas_udf(3, 16, 4)
    via_udf = {
        r["doc_id"]: r["k"] for r in docs.select("doc_id", udf("text").alias("k")).collect()
    }
    assert expr == via_udf


def test_simhash_expression_equals_pandas_udf(spark, docs):
    expr_out = {r["doc_id"]: r["simhash"] for r in simhash_bits(docs).collect()}
    udf = simhash_pandas_udf(64)
    udf_out = {
        r["doc_id"]: r["sh"] for r in docs.select("doc_id", udf("text").alias("sh")).collect()
    }
    assert expr_out == udf_out
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in expr_out.values())


def test_connected_components_known_graph(spark):
    """Path 1-2-3, pair 10-11, chain 20-21-22-23 (diameter 3): components
    labeled by their minimum vertex."""
    from multithreaded_map_reduce_library_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)], ["id_a", "id_b"]
    )
    got = {r["doc"]: r["cluster"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_simhash_near_dups_have_small_hamming(spark, docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash_bits(docs).collect()}
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(out[0], out[3]) == 0
    assert ham(out[0], out[1]) < ham(out[0], out[2])


# --- large-star/small-star connected components (round-2) -----------------


def test_star_cc_equals_minlabel_on_lsh_graph(spark):
    from multithreaded_map_reduce_library_spark.operators.dedup import (
        connected_components,
        connected_components_star,
        minhash_lsh_pairs,
    )
    from multithreaded_map_reduce_library_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    cand = minhash_lsh_pairs(docs, num_hashes=16, bands=4, shingle_n=3)
    a = {(r["doc"], r["cluster"]) for r in connected_components(cand).collect()}
    b = {(r["doc"], r["cluster"]) for r in connected_components_star(cand).collect()}
    assert a == b
    assert len(a) > 0


def test_star_cc_long_chain(spark):
    """Adversarial high-diameter graph: a 200-edge path. Min-label needs
    ~200 rounds (its max_iter would truncate); star rounds contract it in
    O(log^2 n) — must still produce the exact component labeling."""
    from multithreaded_map_reduce_library_spark.operators.dedup import (
        connected_components_star,
    )

    chain = spark.range(0, 200).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    got = {(r["doc"], r["cluster"]) for r in connected_components_star(chain, max_iter=20).collect()}
    assert got == {(i, 0) for i in range(201)}


def test_band_cap_bounds_bucket_pairs(spark, docs):
    """With band_cap=1 no band can produce any pair; with a generous cap
    the candidate set equals the uncapped one."""
    from multithreaded_map_reduce_library_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    capped1 = minhash_lsh_pairs(docs, shingle_n=3, band_cap=1)
    assert capped1.count() == 0
    uncapped = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, shingle_n=3).collect()}
    big_cap = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, shingle_n=3, band_cap=1000).collect()
    }
    assert big_cap == uncapped and len(uncapped) > 0
