"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count()-style full materialization
(collect on the driver is avoided for large results; we use
``df.write.format("noop")`` so the full plan runs distributed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from multithreaded_map_reduce_library_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="mtmrl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in all_queries().items() if q.bench}
    timings: dict[str, float] = {}
    # Warm the JVM/codegen once with the cheapest plan, and boot the Python
    # UDF workers with a trivial pandas UDF, so timings measure the queries,
    # not session/runtime startup.
    next(iter(bench_queries.values())).fn(spark, sf_dir).limit(1).collect()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _ident(s):
        return s

    # Enough partitions to boot one Python worker per core (workers are
    # reused afterwards; otherwise the first wide UDF stage pays the boot).
    spark.range(0, 100_000, 1, 64).select(_ident(col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()

    for name, q in bench_queries.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
