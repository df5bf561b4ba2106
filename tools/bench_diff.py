"""Per-query bench regression diff over BENCH_HISTORY.jsonl.

bench.py appends one record per run; this prints the per-query delta
between the last two records (or any two by index), so round-over-round
regressions are one command to see:

    python tools/bench_diff.py            # last two runs
    python tools/bench_diff.py 0 -1       # first vs latest
"""

from __future__ import annotations

import json
import os
import sys

HIST = os.path.join(
    os.environ.get(
        "MTMRL_REPO_ROOT", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "BENCH_HISTORY.jsonl",
)


def main() -> int:
    with open(HIST) as f:
        runs = [json.loads(line) for line in f if line.strip()]
    if len(runs) < 2:
        print(f"need >= 2 runs in {HIST}, have {len(runs)}")
        return 1
    ia, ib = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) == 3 else (-2, -1)
    a, b = runs[ia], runs[ib]
    # Protocol tag (ADVICE r5): rows without the field predate round 5's
    # quietest-of-<=3-passes guard, i.e. protocol 1 (single pass).
    pa_, pb_ = a.get("protocol", 1), b.get("protocol", 1)
    print(
        f"A: {a.get('ts', '?')} total={a['value']}s sf={a['sf']} proto={pa_}   "
        f"B: {b.get('ts', '?')} total={b['value']}s sf={b['sf']} proto={pb_}"
    )
    if pa_ != pb_:
        print(
            f"WARNING: measurement protocols differ (A={pa_}, B={pb_}) — "
            "totals are not methodologically comparable (protocol 2 records "
            "the quietest of up to 3 passes; protocol 1 records the only pass)"
        )
    sa, sb = a.get("spread", {}), b.get("spread", {})
    rows = []
    for q in sorted(set(a["queries"]) | set(b["queries"])):
        ta, tb = a["queries"].get(q), b["queries"].get(q)
        delta = (tb - ta) if (ta is not None and tb is not None) else None
        rows.append((q, ta, tb, delta))
    rows.sort(key=lambda r: -(r[3] if r[3] is not None else float("inf")))
    for q, ta, tb, delta in rows:
        mark = ""
        spr = max(sa.get(q, 0.0), sb.get(q, 0.0))
        if delta is not None and ta:
            # Noise-aware call (round-4, VERDICT r3 item 8): each record
            # carries the per-query max-min spread over its median-of-3
            # samples; only a move beyond 2 spreads (with a 0.2 s floor
            # for spread-less legacy records) is a regression, everything
            # inside that band is the scheduler.
            if delta > max(0.2, 2.0 * spr):
                mark = "  <-- regression (>2x spread)"
            elif delta > max(0.1, spr):
                mark = "  (within noise: <=2x spread)"
        print(
            f"{q:40s} A={ta} B={tb} "
            f"delta={delta if delta is None else round(delta, 3)} spread={spr}{mark}"
        )
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped through head
        raise SystemExit(0) from None
