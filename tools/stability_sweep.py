"""Repeat-run hash-stability sweep at DRIVER scale (sf0.01).

tests/test_determinism.py runs the same check at sf0.001 on every CI
run; this tool is the heavier once-per-round sweep at the scale the
driver actually samples, because round 1's two flakes
(doc_ngram_novelty, stream_stream_left_outer_purchases) were stable at
small scale and only intermittently unstable at sf0.01. Runs every
registered query N times in one session and reports any name whose
canonical value hash (columns sorted by name, rows as a multiset)
varies. Exit 1 on any instability.

Usage: python tools/stability_sweep.py [N_RUNS] [SF_DIR]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multithreaded_map_reduce_library_spark.plans.registry import all_queries  # noqa: E402
from multithreaded_map_reduce_library_spark.session import get_spark  # noqa: E402
from tests.oracle_util import _canon  # noqa: E402


def canonical_hash(df) -> tuple[str, int]:
    rows = [tuple(r) for r in df.collect()]
    canon = _canon(rows, df.columns)
    lines = sorted("\x01".join(t) + f"\x02{n}" for t, n in canon.items())
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16], len(rows)


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="mtmrl-stability")
    spark.sparkContext.setLogLevel("ERROR")
    unstable = []
    for name, q in sorted(all_queries().items()):
        seen = {canonical_hash(q.fn(spark, sf_dir)) for _ in range(n_runs)}
        status = "STABLE" if len(seen) == 1 else f"UNSTABLE {sorted(seen)}"
        print(f"  {name}: {status}", flush=True)
        if len(seen) != 1:
            unstable.append(name)
    print(f"SWEEP: {len(all_queries()) - len(unstable)} stable, "
          f"{len(unstable)} unstable {unstable}")
    return 1 if unstable else 0


if __name__ == "__main__":
    sys.exit(main())
