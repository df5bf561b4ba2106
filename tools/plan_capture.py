"""Capture ``explain("formatted")`` for registered queries to files.

Round-9 deliverable support: the optimization judge checks plan claims
(Exchange counts, join strategies, BatchEvalPython nodes) against
committed plan dumps, so this tool writes one ``<name><suffix>.txt`` per
query into an output directory.

Usage:
    python tools/plan_capture.py OUTDIR SUFFIX [REGEX] [--code-dir DIR]

- OUTDIR: directory for the dumps (created if missing)
- SUFFIX: appended to the query name (e.g. ``_before`` / ``_after``)
- REGEX:  optional query-name filter (default: bench queries only)
- --code-dir: package root to put at the FRONT of sys.path (a git
  worktree of the pre-optimization commit for ``_before`` captures);
  defaults to the repo this file lives in.

Queries whose builders localCheckpoint intermediates execute those jobs
during capture — the dump then shows the final consumer plan over the
checkpointed scan, which is what actually runs.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _usage_exit() -> None:
    print(__doc__.split("Usage:")[1].strip(), file=sys.stderr)
    raise SystemExit(2)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    code_dir = HERE
    if "--code-dir" in args:
        i = args.index("--code-dir")
        if i + 1 >= len(args):
            print("plan_capture: --code-dir requires a directory", file=sys.stderr)
            _usage_exit()
        code_dir = os.path.abspath(args[i + 1])
        del args[i : i + 2]
    if len(args) < 2:
        print("plan_capture: OUTDIR and SUFFIX are required", file=sys.stderr)
        _usage_exit()
    outdir, suffix = args[0], args[1]
    pattern = re.compile(args[2]) if len(args) > 2 else None
    os.makedirs(outdir, exist_ok=True)
    sys.path.insert(0, code_dir)

    from multithreaded_map_reduce_library_spark.plans.registry import all_queries
    from multithreaded_map_reduce_library_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = 0
    for name, q in sorted(all_queries().items()):
        if pattern is None and not q.bench:
            continue
        if pattern is not None and not pattern.search(name):
            continue
        try:
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep capturing
            text = f"CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(f"-- {name} @ {sf_dir} (code: {code_dir})\n{text}")
        n += 1
        print(f"captured {name}", file=sys.stderr)
    print(f"plan_capture: {n} plans -> {outdir} (suffix {suffix!r})")
    spark.stop()


if __name__ == "__main__":
    main()
