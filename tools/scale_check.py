"""Empirical scale validation (VERDICT r5 item 4): compare two bench.py
JSON outputs taken at different scale factors (sf0.1 vs the synthesized
sf1 from tools/make_sf1.py) and flag any query whose time grows
super-linearly in the data.

A plan that is linear in the corpus should grow by at most the data
factor; in practice fixed overheads (session, planning, Python worker
round-trips, small shuffles) make most ratios land well under it. A query
is flagged when

    ratio > factor * SLACK   and   t_big > MIN_BIG seconds

(SLACK absorbs cache effects and scheduler noise at these absolute
magnitudes; MIN_BIG keeps sub-second queries — where a 100 ms wobble is a
3x "ratio" — out of the flag list).

Usage: python tools/scale_check.py BENCH_SMALL.json BENCH_BIG.json [factor]
Prints a markdown table sorted by ratio (descending) and exits nonzero if
any query is flagged.
"""

from __future__ import annotations

import json
import sys

SLACK = 1.3
MIN_BIG = 1.0


def main() -> int:
    small_path, big_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    with open(small_path) as f:
        small = json.loads(f.read().strip().splitlines()[-1])
    with open(big_path) as f:
        big = json.loads(f.read().strip().splitlines()[-1])
    for name, d in (("small", small), ("big", big)):
        if "queries" not in d:
            raise SystemExit(
                f"{name} bench file has no per-query map — bench.py stdout is "
                "compact since round 7 (driver tail window); capture the full "
                "JSON with SPARK_GRAFT_BENCH_OUT=<path> python bench.py"
            )

    rows = []
    for q in sorted(set(small["queries"]) & set(big["queries"])):
        ts, tb = small["queries"][q], big["queries"][q]
        ratio = tb / ts if ts else float("inf")
        flagged = ratio > factor * SLACK and tb > MIN_BIG
        rows.append((q, ts, tb, ratio, flagged))
    rows.sort(key=lambda r: -r[3])

    print(f"| query | t(sf={small['sf']}) s | t(sf={big['sf']}) s | ratio | verdict |")
    print("|---|---|---|---|---|")
    n_flagged = 0
    for q, ts, tb, ratio, flagged in rows:
        if flagged:
            verdict = f"**FLAG: super-linear (> {factor}x{SLACK})**"
            n_flagged += 1
        elif ratio > factor:
            verdict = "over data factor, inside slack"
        elif ratio > factor / 2:
            verdict = "~linear"
        else:
            verdict = "sublinear (overhead-dominated)"
        print(f"| {q} | {ts} | {tb} | {ratio:.1f}x | {verdict} |")
    print()
    print(
        f"totals: {small['value']} s -> {big['value']} s "
        f"({big['value'] / small['value']:.1f}x at {factor:.0f}x data); "
        f"{n_flagged} flagged / {len(rows)} compared"
    )
    return 1 if n_flagged else 0


if __name__ == "__main__":
    sys.exit(main())
