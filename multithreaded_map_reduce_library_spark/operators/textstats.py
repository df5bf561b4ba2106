"""Text-analysis operators: token stats, language ID, quality scoring,
document fingerprinting. All pure JVM expressions (no Python in the data
path) so a 100 TB corpus pass stays inside whole-stage codegen.

The reference's only scalar function is whitespace tokenization
(distwc.c:16); these extend that into the text-analysis surface a
training-data pipeline needs (driver north star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.text import char_shingles, tokens

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small and public-knowledge; the point is the
#: operator shape (argmax over per-language evidence counts), not lexicon
#: quality.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of", "to", "in", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "zu"),
}

#: "BPE-ish" subword pattern: runs of letters, runs of digits, or a single
#: non-space symbol — a public approximation of byte-pair pre-tokenization.
BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\r\n]"


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column | str, pattern: str = BPE_ISH_RE) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def stopword_count(text: Column | str, lang: str) -> Column:
    toks = tokens(text)
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))


def lang_id(text: Column | str) -> Column:
    """Argmax over per-language stopword-evidence counts; 'und'
    (undetermined) when no language scores above zero. Deterministic
    tie-break: language-code order en < es < fr < de (first maximum wins)."""
    counts = {lang: stopword_count(text, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # Build reversed so earlier languages take precedence on ties.
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column | str) -> Column:
    """Heuristic quality score in [0, 1]: blends length band, mean token
    length band, stopword presence, and alnum-space purity. Weights are
    arbitrary-but-documented; the operator shape (cheap columnar features
    -> bounded score) is the point."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_toks = whitespace_token_count(c)
    avg_tok_len = F.when(n_toks > 0, (F.length(F.regexp_replace(c, " ", "")) / n_toks)).otherwise(0.0)
    sw = sum((stopword_count(c, lang) for lang in LANG_STOPWORDS), F.lit(0))
    sw_ratio = F.when(n_toks > 0, sw / n_toks).otherwise(0.0)
    punct = F.size(F.regexp_extract_all(c, F.lit("[^A-Za-z0-9 ]"), F.lit(0)))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(0.0)
    score = (
        F.when((n_chars >= 100) & (n_chars <= 20000), 0.25).otherwise(0.0)
        + F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), 0.25).otherwise(0.0)
        + F.least(sw_ratio * F.lit(2.5), F.lit(0.25))
        + F.lit(0.25) * (1 - F.least(punct_ratio * F.lit(5), F.lit(1.0)))
    )
    return score


def fingerprint_minmax(text: Column | str, n: int = 8) -> tuple[Column, Column]:
    """Rolling-hash-style document fingerprint: (min, max) md5 over the
    document's character n-grams — a 2-sketch of the winnowing family.
    Fixed-width hex min/max == numeric min/max of the 128-bit hashes."""
    hashes = F.transform(char_shingles(text, n), F.md5)
    return F.array_min(hashes), F.array_max(hashes)
