"""Text primitives: tokenization and shingling, all JVM-side expressions.

Tokenization mirrors the reference mapper's ``strsep(line, " \\t\\n\\r")``
(distwc.c:15-18). Quirk Q1 (SURVEY.md §2): strsep yields empty tokens for
consecutive delimiters; the engine filters them by default (the reference
fixtures contain none), with ``keep_empty=True`` available for byte parity
on pathological inputs.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas-UDF type hints resolve

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's delimiter set, as a regex character class (distwc.c:16).
DELIMS_RE = "[ \t\r\n]"


def tokens(col: Column | str, pattern: str = DELIMS_RE, keep_empty: bool = False) -> Column:
    """Split text into a token array (reference O2, distwc.c:15-18)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(c, pattern)
    if not keep_empty:
        arr = F.filter(arr, lambda t: t != F.lit(""))
    return arr


def word_shingles(col: Column | str, n: int = 5, pattern: str = DELIMS_RE) -> Column:
    """Array of word n-grams ("shingles") for near-dup detection.

    Pure expression: slice the token array at each start offset and join
    with a single space. Short documents (< n tokens) yield one shingle of
    the whole document so they still participate in dedup.
    """
    toks = tokens(col, pattern)
    joined_all = F.array_join(toks, " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(F.size(toks) < n, F.array(joined_all)).otherwise(grams)


def word_shingle_hash32(toks: Column, n: int = 3) -> Column:
    """32-bit hashes of word n-gram shingles in ONE pass: array<long> where
    element j = int(md5(shingle_j)[:8], 16), shingle_j being the same
    space-joined n-gram :func:`word_shingles` would build.

    Why fused: Spark's higher-order functions run *interpreted* (no
    whole-stage codegen), so each transform pass over a shingle array has
    real per-element overhead — building string shingles and hashing them
    in separate passes measured 2.5s+ at sf0.1 vs fusing construction and
    hashing into this single transform. Downstream dedup only ever needs
    the hash, never the shingle string.

    ``toks`` MUST be a materialized token-array column (not an inline
    ``tokens(...)`` expression): the lambda references it per element and
    Catalyst re-evaluates inlined expressions inside lambdas.
    """
    whole = F.conv(F.substring(F.md5(F.array_join(toks, " ")), 1, 8), 16, 10).cast("long")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1)))

    def gram_hash(i: Column) -> Column:
        parts = [F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        return F.conv(F.substring(F.md5(F.concat_ws(" ", *parts)), 1, 8), 16, 10).cast("long")

    return F.when(F.size(toks) < n, F.array(whole)).otherwise(
        F.transform(starts, gram_hash)
    )


def shingle_hash32_pandas_udf(n: int = 3):
    """Arrow-batched twin of :func:`word_shingle_hash32`: same tokens, same
    space-joined n-grams, same int(md5[:8], 16) values — but hashlib's C
    md5 instead of ~270k interpreted expression evaluations (the dedup
    pipeline's hot loop; measured >2x on the banding stage at sf0.1).
    Bit-exact: integer outputs, no float path, so oracle hashes are
    unaffected. Tests assert equality with the expression form.
    """
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def hashes(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            toks = [
                t
                for t in text.replace("\t", " ").replace("\r", " ").replace("\n", " ").split(" ")
                if t
            ]
            if len(toks) < n:
                grams = [" ".join(toks)]
            else:
                grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            out.append(
                [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) for g in grams]
            )
        return pd.Series(out)

    return hashes


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Array of character n-grams (for fingerprinting / rolling-hash style
    sketches). Documents shorter than n yield the whole text."""
    c = F.col(col) if isinstance(col, str) else col
    starts = F.sequence(F.lit(1), F.greatest(F.length(c) - n + 1, F.lit(1)))
    return F.transform(starts, lambda i: F.substring(c, i, n))
