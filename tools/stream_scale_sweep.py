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
    # --only a,b,c restricts the sweep to named twins (e.g. re-measuring
    # the stateful trio's emitted-row growth without paying for all 17)
    only = (
        set(sys.argv[sys.argv.index("--only") + 1].split(","))
        if "--only" in sys.argv
        else None
    )
    skip = set()
    for flag in ("--runs", "--out", "--only"):
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
    if only is not None:
        missing = only - set(twins)
        if missing:
            print(f"unknown twins: {sorted(missing)}", file=sys.stderr)
            return 2
        twins = {n: q for n, q in twins.items() if n in only}
    results: dict[str, dict[str, float]] = {n: {} for n in twins}
    # emitted-row counts per twin per decade (VERDICT r8 item 6): for
    # update-mode stateful twins the SINK volume — every touched key
    # re-emitted per micro-batch — is what grows with the data, while
    # state stays bounded by distinct keys; recording the count turns
    # that claim into a measurement at zero extra cost (the drain's
    # count() already computes it).
    emitted: dict[str, dict[str, int]] = {n: {} for n in twins}
    for sf_dir in args:
        for name, q in twins.items():
            samples = []
            n_rows = 0
            for _ in range(runs):
                t0 = time.perf_counter()
                n_rows = q.fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            results[name][sf_dir] = round(min(samples), 2)
            emitted[name][sf_dir] = n_rows
            print(
                f"{sf_dir} {name}: {results[name][sf_dir]}s rows={n_rows} (runs={runs})",
                flush=True,
            )
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"times": results, "rows": emitted}, f, indent=1)
    # markdown table when 3 dirs given, headers from the actual dirs
    if len(args) == 3:
        a, b, c = args
        la, lb, lc = (os.path.basename(d.rstrip("/")) for d in args)
        print(
            f"\n| streaming twin | {la} s | {lb} s | {lc} s | {lb}/{la} | {lc}/{lb} "
            f"| rows {la} | rows {lb} | rows {lc} |"
        )
        print("|---|---|---|---|---|---|---|---|---|")
        for n, r in results.items():
            r10 = r[b] / r[a] if r[a] else float("nan")
            r100 = r[c] / r[b] if r[b] else float("nan")
            e = emitted[n]
            print(
                f"| {n} | {r[a]:.2f} | {r[b]:.2f} | {r[c]:.2f} "
                f"| {r10:.1f}x | {r100:.1f}x "
                f"| {e[a]} | {e[b]} | {e[c]} |"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
