"""Hash functions.

``djb2`` reproduces the reference partitioner (mapreduce.c:154-160:
``h = 5381; h = h*33 + c`` over the key bytes, mod num_partitions) for
byte-exact output-shard parity (SURVEY.md Q3 / risk #1). It exists in two
forms: a plain Python function (parity layer / tests) and a pure Column
expression built from ``aggregate`` over the key's characters — JVM-side,
no Python UDF, so the parity sink stays inside whole-stage codegen.

Everything else in the engine uses Spark's built-in Murmur3
``HashPartitioning`` (the scale-correct default); djb2 is opt-in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_U32 = 1 << 32


def djb2(key: str, num_partitions: int | None = None) -> int:
    """Reference partitioner (mapreduce.c:154-160), Python form."""
    h = 5381
    for ch in key.encode("utf-8"):
        h = (h * 33 + ch) % _U32
    return h % num_partitions if num_partitions else h


def djb2_expr(col: Column | str, num_partitions: int | None = None) -> Column:
    """djb2 as a JVM-side Column expression (no Python UDF).

    ``aggregate(split(key,''), 5381, (acc,c) -> (acc*33 + ascii(c)) % 2^32)``.
    Matches :func:`djb2` for ASCII keys (the reference's fixtures are ASCII;
    ``ascii()`` returns the first code point, so multi-byte UTF-8 diverges —
    documented, and irrelevant for parity with the C library which hashes
    raw bytes).
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda ch: ch != F.lit(""))
    h = F.aggregate(
        chars,
        F.lit(5381).cast("long"),
        lambda acc, ch: (acc * F.lit(33) + F.ascii(ch)) % F.lit(_U32),
    )
    return (h % F.lit(num_partitions)).cast("int") if num_partitions else h


def md5_salted(col: Column | str, salt: int | str) -> Column:
    """Deterministic keyed hash family: md5(salt || '|' || value) as hex.

    Fixed-width lowercase hex compares lexicographically exactly like the
    128-bit integer it encodes, so MIN/MAX over these strings is a valid
    min-hash — and both Spark and DuckDB compute identical md5 hex, which
    makes every sketch built on this family oracle-checkable in SQL.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(str(salt)), F.lit("|"), c))
