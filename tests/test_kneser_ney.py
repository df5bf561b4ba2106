"""Property tests for the Kneser-Ney bigram LM queries."""

from __future__ import annotations

import math

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

_Q = all_queries()


def test_kn_probabilities_form_a_distribution(spark, tmp_path):
    """On a closed corpus where every (a,b) bigram is in the model,
    sum_b p(b|a) must be ~1 for every context a (KN's mass-conservation
    property; the grid introduces <=0.5e-6 per term)."""
    rows = [(1, "a b a b a c b c a b", "en", "w", 1),
            (2, "b a c a b a b c", "en", "w", 1)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    import multithreaded_map_reduce_library_spark.plans.pipeline17 as p17
    from multithreaded_map_reduce_library_spark.sources.catalog import load_table

    docs = load_table(spark, str(tmp_path), "documents")
    _bg, cab, ca, cont, types = p17._spark_kn_tables(docs)
    from pyspark.sql import functions as F

    probs = (
        cab.join(ca, "a").join(cont, "b").crossJoin(types)
        .select("a", "b", p17._spark_kn_prob().alias("p"))
        .collect()
    )
    by_a = {}
    for r in probs:
        by_a.setdefault(r["a"], 0.0)
        by_a[r["a"]] += r["p"]
    # mass reserved for unseen continuations of a is redistributed over
    # ALL continuation types; on a closed vocab sum_b<seen> p <= 1 and
    # close to 1
    for a, s in by_a.items():
        assert 0.5 < s <= 1.0 + 1e-9, (a, s)


def test_perplexity_flags_surprising_docs(spark):
    out = {r["doc_id"]: r for r in _Q["doc_perplexity_bigram"].fn(spark, SF_SMALL).collect()}
    assert out
    bits = [r["avg_bits"] for r in out.values()]
    assert all(b > 0 for b in bits)
    # vocabulary ~31 tokens -> conditional bits/bigram must be below
    # log2(vocab^1) and above 0
    assert max(bits) < math.log2(2048)
