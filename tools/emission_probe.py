"""Measure RAW SINK EMISSION for the update-mode stateful twins
(VERDICT r8 item 6).

The scale sweep's `rows` column counts each registered query's RESULT —
but the update-mode twins (`stream_ewma_user_values`,
`stream_user_running_totals`) dedup to one row per key AFTER the drain,
so their result count is exactly the distinct-key count by construction.
The growth claim to verify is about the SINK: update mode re-emits every
touched key per micro-batch, so sink volume = sum over micro-batches of
touched keys — bounded by micro_batches x distinct_keys, and that (not
state, which is O(distinct keys) regardless) is what grows with drain
granularity.

This probe intercepts ``run_stream_to_df`` to record, per drain: the raw
emitted-row count (the returned static DF before any post-drain dedup)
and the number of micro-batches (b<id> sink subdirs), then runs the trio
at each decade and prints emission vs distinct keys.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from multithreaded_map_reduce_library_spark.plans.registry import all_queries  # noqa: E402
from multithreaded_map_reduce_library_spark.session import get_spark  # noqa: E402
from multithreaded_map_reduce_library_spark.streaming import windows as W  # noqa: E402

DIRS = ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
TWINS = [
    "stream_ewma_user_values",
    "stream_user_running_totals",
    "stream_session_windows",
]


def main() -> int:
    spark = get_spark(app_name="emission-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    orig = W.run_stream_to_df
    captured: list[tuple[int, int, str]] = []  # (raw_rows, n_batches, mode)

    def probe(spark_, streaming_df, output_mode="complete"):
        df = orig(spark_, streaming_df, output_mode)
        # the drain is done; the returned DF is a static parquet read of
        # the sink — its count IS the raw emission (pre post-drain dedup)
        n = df.count()
        files = df.inputFiles()
        batches = {f.split("/b")[-1].split("/")[0] for f in files if "/b" in f}
        captured.append((n, len(batches), output_mode))
        return df

    W.run_stream_to_df = probe
    try:
        print("| twin | decade | sink rows | micro-batches | distinct keys | result rows |")
        print("|---|---|---|---|---|---|")
        for d in DIRS:
            users = (
                spark.read.parquet(f"{d}/events.parquet")
                .select("user_id")
                .distinct()
                .count()
            )
            for name in TWINS:
                captured.clear()
                res = qs[name].fn(spark, d).count()
                raw, nb, mode = captured[-1]
                label = os.path.basename(d.rstrip("/"))
                print(
                    f"| {name} | {label} | {raw} | {nb} | {users} | {res} |",
                    flush=True,
                )
    finally:
        W.run_stream_to_df = orig
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
