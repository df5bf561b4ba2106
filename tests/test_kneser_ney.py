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


def test_kn_matches_independent_python_reference(spark):
    """The Spark KN probabilities (via the registered query's integer
    grid) must match an independently-written Python implementation of
    interpolated KN on the same corpus — the strongest check short of
    the DuckDB oracle, because it shares no code with the plan."""
    from collections import Counter, defaultdict

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    cab = Counter()
    for r in docs:
        toks = [t for t in r["text"].replace("\t", " ").split(" ") if t]
        for a, b in zip(toks, toks[1:]):
            cab[(a, b)] += 1
    ca = Counter()
    n1p_fwd = Counter()
    n1p_rev = Counter()
    for (a, b), c in cab.items():
        ca[a] += c
        n1p_fwd[a] += 1
        n1p_rev[b] += 1
    n_types = len(cab)
    d = 0.75

    def kn(a, b):
        return max(cab[(a, b)] - d, 0.0) / ca[a] + (d * n1p_fwd[a] / ca[a]) * (
            n1p_rev[b] / n_types
        )

    got = {(r["a"], r["b"]): r["prob_e6"]
           for r in _Q["bigram_lm_kneser_ney"].fn(spark, SF_SMALL).collect()}
    assert got
    for (a, b), pe6 in got.items():
        assert cab[(a, b)] >= 2
        ref = math.floor(kn(a, b) * 1_000_000 + 0.5)
        assert pe6 == ref, (a, b, pe6, ref)
    # and the query covers exactly the c>=2 bigrams
    assert set(got) == {k for k, c in cab.items() if c >= 2}
