"""Three-decade scale sweep of ALL streaming twins (VERDICT r7 item 6).

The 17 streaming queries are not bench.py entries (an AvailableNow drain
is a one-shot pipeline, not a steady-state rate), so they get their own
sweep: each twin is timed end-to-end — plan build, stream drain through
the foreachBatch parquet sink, and a count() of the returned static
result — at each given data dir. Per twin we take the min of N runs
(default 2; the first run pays codegen + state-store init).

Usage:
  python tools/stream_scale_sweep.py <sf_dir> [<sf_dir> ...] \
      [--runs N] [--out results.json]

For /tmp/sf10 export SPARK_GRAFT_DRIVER_MEM=32g (local[32] shares one
heap; see the verify skill's scale notes).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from multithreaded_map_reduce_library_spark.plans.registry import all_queries  # noqa: E402
from multithreaded_map_reduce_library_spark.session import get_spark  # noqa: E402


def main() -> int:
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 2
    out_path = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else None
    skip = set()
    for flag in ("--runs", "--out"):
        if flag in sys.argv:
            skip.add(sys.argv.index(flag) + 1)
    args = [
        a
        for i, a in enumerate(sys.argv[1:], start=1)
        if not a.startswith("--") and i not in skip
    ]
    if not args:
        print("usage: stream_scale_sweep.py <sf_dir> [...]", file=sys.stderr)
        return 2
    spark = get_spark(app_name="stream-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    twins = {n: q for n, q in sorted(all_queries().items()) if n.startswith("stream_")}
    results: dict[str, dict[str, float]] = {n: {} for n in twins}
    for sf_dir in args:
        for name, q in twins.items():
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            results[name][sf_dir] = round(min(samples), 2)
            print(f"{sf_dir} {name}: {results[name][sf_dir]}s (runs={runs})", flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    # markdown table when 3 dirs given, headers from the actual dirs
    if len(args) == 3:
        a, b, c = args
        la, lb, lc = (os.path.basename(d.rstrip("/")) for d in args)
        print(f"\n| streaming twin | {la} s | {lb} s | {lc} s | {lb}/{la} | {lc}/{lb} |")
        print("|---|---|---|---|---|---|")
        for n, r in results.items():
            r10 = r[b] / r[a] if r[a] else float("nan")
            r100 = r[c] / r[b] if r[b] else float("nan")
            print(
                f"| {n} | {r[a]:.2f} | {r[b]:.2f} | {r[c]:.2f} "
                f"| {r10:.1f}x | {r100:.1f}x |"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
