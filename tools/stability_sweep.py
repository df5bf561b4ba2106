"""Driver-faithful repeat-run stress gate at DRIVER scale (sf0.01).

tests/test_determinism.py runs a light 2x check at sf0.001 on every CI
run; this tool is the heavier once-per-round sweep reproducing the
run-conditions the driver has that sorted one-per local runs don't
(VERDICT r2 item 2 — the round-2 local gates were provably weaker than
the driver's):

- RANDOMIZED query order in ONE shared session per pass (catches
  session-conf / run-order coupling: any query whose result depends on
  which queries ran before it hashes differently between passes);
- a MULTI-FILE events source leg: events.parquet is split into N
  row-chunk files in a temp sf_dir and SPARK_GRAFT_STREAM_MAXFILES=1
  forces Trigger.AvailableNow to drain it in N micro-batches, so
  watermark advancement / batch-boundary dependence shows up (the prime
  suspect for the twice-burned stream-stream left-outer);
- hashes are EXACT (no float normalization — tests/oracle_util._cell).

Every registered query runs once per pass; any name whose canonical
value hash (columns sorted by name, rows as a multiset) differs across
passes is reported. Exit 1 on any instability.

Usage: python tools/stability_sweep.py [N_PASSES] [SF_DIR] [--split-events N]
"""

from __future__ import annotations

import hashlib
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_util import _canon  # noqa: E402


def canonical_hash(df) -> tuple[str, int]:
    rows = [tuple(r) for r in df.collect()]
    canon = _canon(rows, df.columns)
    lines = sorted("\x01".join(t) + f"\x02{n}" for t, n in canon.items())
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16], len(rows)


def split_events_sf_dir(sf_dir: str, n_files: int) -> str:
    """Build a temp sf_dir whose events.parquet is a DIRECTORY of
    ``n_files`` row-chunk parquet files (row order preserved — chunk i is
    rows [i*sz, (i+1)*sz)); all other tables symlink to the originals.
    DuckDB reads the directory via the glob fallback in oracle_util."""
    import duckdb

    out = tempfile.mkdtemp(prefix="mtmrl_sweep_sf_")
    for f in os.listdir(sf_dir):
        src = os.path.join(sf_dir, f)
        if f == "events.parquet":
            continue
        os.symlink(src, os.path.join(out, f))
    ev_dir = os.path.join(out, "events.parquet")
    os.makedirs(ev_dir)
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    sz = -(-n // n_files)
    for i in range(n_files):
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/events.parquet' "
            f"LIMIT {sz} OFFSET {i * sz}) "
            f"TO '{ev_dir}/part-{i:05d}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return out


def main() -> int:
    args = [a for a in sys.argv[1:]]
    split_n = 0
    if "--split-events" in args:
        i = args.index("--split-events")
        split_n = int(args[i + 1])
        del args[i : i + 2]
    n_passes = int(args[0]) if len(args) > 0 else 2
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    tmp_dir = None
    if split_n:
        tmp_dir = split_events_sf_dir(sf_dir, split_n)
        sf_dir = tmp_dir
        os.environ["SPARK_GRAFT_STREAM_MAXFILES"] = "1"
        print(f"SPLIT: events.parquet -> {split_n} files under {sf_dir}; "
              f"maxFilesPerTrigger=1 (multi-micro-batch streaming)")

    from multithreaded_map_reduce_library_spark.plans.registry import all_queries
    from multithreaded_map_reduce_library_spark.session import get_spark

    spark = get_spark(app_name="mtmrl-stability")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    seen: dict[str, set] = {name: set() for name in qs}
    try:
        for p in range(n_passes):
            order = sorted(qs)
            # pass 0 sorted (the old local baseline), later passes shuffled
            # with a per-pass seed so each pass interleaves differently.
            if p > 0:
                random.Random(1000003 * p).shuffle(order)
            print(f"PASS {p} order={'sorted' if p == 0 else 'shuffled'}")
            for name in order:
                h = canonical_hash(qs[name].fn(spark, sf_dir))
                seen[name].add(h)
        unstable = [n for n in sorted(seen) if len(seen[n]) > 1]
        for n in unstable:
            print(f"  UNSTABLE {n}: {sorted(seen[n])}")
        print(f"SWEEP: {len(qs) - len(unstable)} stable, "
              f"{len(unstable)} unstable {unstable}")
        return 1 if unstable else 0
    finally:
        if tmp_dir:
            shutil.rmtree(tmp_dir, ignore_errors=True)
            os.environ.pop("SPARK_GRAFT_STREAM_MAXFILES", None)


if __name__ == "__main__":
    sys.exit(main())
