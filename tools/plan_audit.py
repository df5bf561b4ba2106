"""Physical-plan audit across the whole registry: explain every query and
flag the shapes that break at 100 TB.

Checks per query (tags declare intent, so e.g. a cross join tagged
'cross' is expected):
  CARTESIAN  CartesianProduct without a 'cross' tag
  1PART      Exchange SinglePartition without a global-order reason
             ('topk'/'global-sort'/'ntile'/'histogram'/'zipf' tags)
  PYTHON     Python eval nodes (BatchEvalPython / ArrowEval / MapInPandas /
             FlatMapGroupsInPandas / PythonUDTF / FlatMapCoGroupsInPandas)
             in a query not tagged as a Python-surface query
  BNLJ       BroadcastNestedLoopJoin without a theta-join reason
             ('skyline'/'theta'/'range-join'/'asof' tags or a broadcast
             scalar crossJoin)

Usage: python tools/plan_audit.py [--json out.json]
Exit 1 if any UNEXPECTED flag fires.
"""

from __future__ import annotations

import contextlib
import io
import json
import sys

sys.path.insert(0, "/root/repo")

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from multithreaded_map_reduce_library_spark.session import get_spark

PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "PythonUDTF",
    "MapInArrow",
)
PY_TAGS = {"udf", "pandas", "rdd", "mapreduce-api", "udtf", "multimodal", "simhash", "minhash", "lsh", "dedup", "combiner"}
GLOBAL_TAGS = {"topk", "global-sort", "ntile", "histogram", "zipf", "corpus-stats", "window", "scd2", "streaming", "sequence", "packing"}
THETA_TAGS = {"skyline", "theta", "range-join", "asof", "cross", "cross-join", "band", "fuzzy", "decontamination", "evaluation", "sweep", "sweep-line", "interval", "similarity", "knn", "ann", "ivf", "centroid", "kmeans"}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, tags: set[str], plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan and "cross" not in tags:
        flags.append("CARTESIAN")
    if "Exchange SinglePartition" in plan and not (tags & GLOBAL_TAGS):
        flags.append("1PART")
    if any(n in plan for n in PY_NODES) and not (tags & PY_TAGS):
        flags.append("PYTHON")
    if (
        "BroadcastNestedLoopJoin" in plan
        and not (tags & THETA_TAGS)
        # A grand-aggregate ("Keys [0]") feeding a broadcast is the
        # one-row-scalar crossJoin pattern (global count, latest day,
        # TPC-H scalar subquery) — a constant-size broadcast, fine at any
        # scale.
        and "Keys: []" not in plan
    ):
        flags.append("BNLJ")
    return flags


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    bad = 0
    for name, q in sorted(all_queries().items()):
        tags = set(q.tags)
        if "streaming" in tags or name.startswith("stream_"):
            results[name] = {"skipped": "streaming (plan materializes on drain)"}
            continue
        try:
            plan = plan_of(q.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:200]}
            bad += 1
            print(f"ERROR {name}: {str(e)[:120]}")
            continue
        flags = audit(name, tags, plan)
        results[name] = {"flags": flags}
        if flags:
            bad += 1
            print(f"FLAG {name}: {flags}")
    print(f"AUDITED {len(results)} queries, {bad} flagged/errored")
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
