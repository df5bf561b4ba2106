"""Word count — the reference's flagship dataflow (SURVEY.md §7 Phase 0).

Covers reference operators O1 (text scan), O2 (tokenize/flatMap), O3
(constant value attach — skipped: quirk Q2, the value is never read),
O4/O5 (hash shuffle), O7 (group-by-key), O9 (COUNT(*) per key).

The whole pipeline is four Catalyst operators; the shuffle gets a
map-side partial HashAggregate automatically — strictly better than the
reference, which materializes every ("word","1") pair across the shuffle
(mapreduce.c:111-144, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.text import DELIMS_RE, tokens
from multithreaded_map_reduce_library_spark.sources.catalog import read_text_lines


def wordcount(
    df: DataFrame,
    text_col: str = "value",
    pattern: str = DELIMS_RE,
    keep_empty: bool = False,
) -> DataFrame:
    """COUNT(*) per token over a text column.

    Quirk Q1 (distwc.c:16-17): the reference emits empty tokens for
    consecutive delimiters; default here filters them (the golden fixtures
    contain none), ``keep_empty=True`` restores byte parity.
    Quirk Q2 (distwc.c:27-30): the reference counts occurrences, ignoring
    emitted values — so COUNT(*), never SUM(value).
    """
    return (
        df.select(F.explode(tokens(text_col, pattern, keep_empty)).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
    )


def wordcount_files(spark: SparkSession, paths: str | list[str], **kw) -> DataFrame:
    """End-to-end reference pipeline: text files -> (key, cnt)."""
    return wordcount(read_text_lines(spark, paths), **kw)
