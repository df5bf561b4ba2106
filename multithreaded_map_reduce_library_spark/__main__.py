"""Command-line entry points — the reference's user-facing surface.

The reference ships a compiled binary driven as ``./wordcount
sample_inputs/*.txt`` with hard-coded ``num_workers=5, num_parts=10``
(distwc.c:37-39) writing ``result-<p>.txt`` shards (distwc.c:31-34). A
user migrating from it gets the same job here as::

    python -m multithreaded_map_reduce_library_spark wordcount \
        sample_inputs/*.txt -o out/ --partitions 10 --workers 5

plus access to every registered analytical query::

    python -m multithreaded_map_reduce_library_spark list
    python -m multithreaded_map_reduce_library_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --show 10

``--workers N`` maps to ``local[N]`` exactly as the reference's pool size
maps to concurrent mappers; on a real cluster you'd omit it and let
spark-submit set the master.
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Sequence

from pyspark.sql import functions as F


def _wordcount(args: argparse.Namespace) -> int:
    from multithreaded_map_reduce_library_spark.session import get_spark
    from multithreaded_map_reduce_library_spark.sources.sinks import (
        write_partitioned_text,
    )

    spark = get_spark(
        app_name="mtmrl-wordcount",
        master=f"local[{args.workers}]" if args.workers else None,
    )
    if args.engine == "rdd":
        from multithreaded_map_reduce_library_spark.mapreduce.api import (
            mr_run,
            wordcount_mapper,
            wordcount_reducer,
        )

        reduced = mr_run(
            spark,
            args.files,
            wordcount_mapper,
            wordcount_reducer,
            num_partitions=args.partitions,
            output_dir=args.output if args.output else None,
        )
        if not args.output:
            for k, v in reduced.collect():
                print(f"{k}: {v}")
        return 0

    # DataFrame engine (the scale path): scan -> tokenize -> count.
    from multithreaded_map_reduce_library_spark.functions.text import tokens

    df = (
        spark.read.text(args.files)
        .select(F.explode(tokens(F.col("value"))).alias("key"))
        .groupBy("key")
        .count()
    )
    if args.output:
        write_partitioned_text(
            df, args.output, value_col="count", num_partitions=args.partitions
        )
    else:
        for row in df.orderBy("key").collect():
            print(f"{row['key']}: {row['count']}")
    return 0


def _run(args: argparse.Namespace) -> int:
    from multithreaded_map_reduce_library_spark.plans.registry import all_queries
    from multithreaded_map_reduce_library_spark.session import get_spark

    qs = all_queries()
    if args.query not in qs:
        print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"mtmrl-{args.query}")
    df = qs[args.query].fn(spark, args.sf_dir)
    if args.output:
        writer = df.write.mode("overwrite")
        getattr(writer, args.format)(args.output)
        print(f"wrote {args.output} ({args.format})")
    else:
        df.show(args.show, truncate=False)
    return 0


def _list(_args: argparse.Namespace) -> int:
    from multithreaded_map_reduce_library_spark.plans.registry import all_queries

    for name, q in sorted(all_queries().items()):
        oracle = "oracle" if q.oracle else "rows-only"
        tags = ",".join(q.tags)
        print(f"{name}\t[{oracle}]\t{tags}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m multithreaded_map_reduce_library_spark",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    wc = sub.add_parser("wordcount", help="reference-parity word count")
    wc.add_argument("files", nargs="+", help="input text files")
    wc.add_argument("-o", "--output", help="output dir (DJB2-sharded text)")
    wc.add_argument(
        "-p", "--partitions", type=int, default=10, help="output shards (ref: 10)"
    )
    wc.add_argument(
        "-w", "--workers", type=int, default=None, help="local cores (ref: 5)"
    )
    wc.add_argument(
        "--engine",
        choices=("dataframe", "rdd"),
        default="dataframe",
        help="dataframe = scale path; rdd = MR_Run parity facade",
    )
    wc.set_defaults(fn=_wordcount)

    run = sub.add_parser("run", help="run a registered query")
    run.add_argument("query", help="query name from `list`")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--show", type=int, default=20, help="rows to print")
    run.add_argument("-o", "--output", help="write result instead of printing")
    run.add_argument("--format", choices=("parquet", "csv", "json"), default="parquet")
    run.set_defaults(fn=_run)

    ls = sub.add_parser("list", help="list registered queries")
    ls.set_defaults(fn=_list)
    return p


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
