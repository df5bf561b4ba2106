"""Behavior tests for the pipeline-8 corpus-cleaning operators on
CONSTRUCTED inputs with known answers (the oracle-parity and
determinism suites already cover them on the driver tables; these pin
the semantics on real-looking text the synthetic fixture can't
exercise)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans import pipeline8 as p8
from multithreaded_map_reduce_library_spark.plans.registry import all_queries

_Q = all_queries()


def _docs_dir(spark, tmp_path, rows):
    """Write synthetic docs as <tmp>/documents.parquet so the registered
    query fns (which load_table from an sf_dir) run unchanged on them."""
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_pii_redaction_on_real_text(spark, tmp_path):
    """Realistic PII (not just the deterministic footer) is counted and
    scrubbed: 2 emails, 1 phone, 1 IP in the body, plus the footer's
    1 email + 1 phone + 1 IP."""
    text = (
        "reach me at alice.smith+work@mail.example.org or bob@corp.io , "
        "call 555-0199 , server at 192.168.0.17 ."
    )
    sf = _docs_dir(spark, tmp_path, [(7, text, "en", "web", len(text))])
    row = _Q["pii_redaction_stats"].fn(spark, sf).collect()[0]
    assert row["n_emails"] == 2 + 1
    assert row["n_phones"] == 1 + 1
    assert row["n_ips"] == 1 + 1
    assert row["chars_removed"] > 0


def test_pii_redaction_replaces_all_occurrences(spark):
    """The redacted string itself: every match replaced, surrounding text
    intact (checked via the expression directly on a literal)."""
    s = "a@b.com x 10.0.0.1 y 555-1234 z c@d.net"
    out = (
        spark.range(1)
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lit(s), p8._EMAIL_RE, "[EMAIL]"),
                    p8._IP_RE,
                    "[IP]",
                ),
                p8._PHONE_RE,
                "[PHONE]",
            ).alias("r")
        )
        .collect()[0]["r"]
    )
    assert out == "[EMAIL] x [IP] y [PHONE] z [EMAIL]"


def test_url_blocklist_flags_expected_domains(spark):
    sf = "/root/testdata/sf0.001"
    rows = _Q["url_domain_stats"].fn(spark, sf).collect()
    blocked = {r["host"] for r in rows if r["blocked"]}
    assert blocked == {"ads.tracker.net", "spam.click"}
    # every host maps to exactly one row and docs partition across hosts
    assert len(rows) == len({r["host"] for r in rows})


def test_line_dedup_flags_shared_chunks(spark, tmp_path):
    """A 3-token chunk shared verbatim by 3+ docs is boilerplate; a
    unique chunk is kept. Tail tokens (< one chunk) are out of scope."""
    boiler = "all rights reserved"
    rows = [
        (1, f"{boiler} unique one alpha tail", "en", "w", 1),
        (2, f"{boiler} unique two bravo", "en", "w", 1),
        (3, f"{boiler} unique three charlie", "en", "w", 1),
        (4, "totally fresh content here now six", "en", "w", 1),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in _Q["line_dedup_boilerplate"].fn(spark, sf).collect()}
    for d in (1, 2, 3):
        assert out[d]["n_lines"] == 2
        assert out[d]["n_boiler"] == 1
        assert out[d]["n_kept_tokens"] == 3
    assert out[4]["n_boiler"] == 0
    assert out[4]["n_kept_tokens"] == 6


def test_unigram_logprob_uniform_corpus_is_log2_vocab(spark, tmp_path):
    """Four equally frequent tokens -> every doc scores exactly 2.0
    bits/token (log2 of the vocabulary size; quantization is exact for
    integral bits)."""
    rows = [
        (1, "aa bb cc dd", "en", "w", 11),
        (2, "dd cc bb aa", "en", "w", 11),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    for r in _Q["doc_unigram_logprob"].fn(spark, sf).collect():
        assert r["n_tokens"] == 4
        assert r["avg_bits"] == pytest.approx(2.0, abs=1e-12)


def test_unigram_logprob_rare_tokens_score_higher(spark):
    """On the driver fixture: the doc-level score orders rare-token docs
    above common-token docs — sanity that the signal is directional."""
    df = _Q["doc_unigram_logprob"].fn(spark, "/root/testdata/sf0.001")
    stats = df.agg(
        F.min("avg_bits").alias("lo"), F.max("avg_bits").alias("hi")
    ).collect()[0]
    assert 0 < stats["lo"] <= stats["hi"]


def test_approx_quantile_within_bound(spark):
    rows = _Q["approx_quantile_error"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["within_bound"] for r in rows)
