"""Registry-wide physical-plan audit as a regression net: every batch
query's plan is checked for the shapes that break at 100 TB (accidental
cartesian products, unexplained single-partition exchanges, Python eval
nodes in JVM-only queries, non-scalar nested-loop joins). tools/
plan_audit.py is the same audit as a CLI."""

from __future__ import annotations

import pytest

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tools.plan_audit import audit, plan_of

from .conftest import SF_SMALL


def test_allowlist_has_scaling_register_row():
    """Round-5 rule (VERDICT r4 item 5): every plan-audit allowlist entry
    must have a row in SCALING.md's 'Plan-audit allowlist register'
    section stating its boundedness argument, and vice versa — a
    greppable 1:1 mapping, so an allowlist exemption can never again
    live only as a one-liner while SCALING.md (the 100 TB register)
    stays silent about it."""
    import os
    import re

    from tools.plan_audit import ALLOW_BNLJ, ALLOW_PYTHON

    scaling = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    with open(scaling) as f:
        text = f.read()
    m = re.search(
        r"## Plan-audit allowlist register.*?(?=\n## (?!#)|\Z)", text, re.DOTALL
    )
    assert m, "SCALING.md lost its 'Plan-audit allowlist register' section"
    registered = set(re.findall(r"^- `([a-z0-9_]+)` — ", m.group(0), re.MULTILINE))
    allowlisted = set(ALLOW_BNLJ) | set(ALLOW_PYTHON)
    missing_rows = allowlisted - registered
    stale_rows = registered - allowlisted
    assert not missing_rows, f"allowlist entries without a SCALING.md row: {missing_rows}"
    assert not stale_rows, f"SCALING.md register rows without an allowlist entry: {stale_rows}"


@pytest.mark.slow  # builds all 452 plans (~4.5 min); tools/plan_audit.py
# is the same audit as a CLI and runs in the builder's round end-gate
def test_no_scale_hostile_plan_shapes(spark):
    failures = {}
    for name, q in sorted(all_queries().items()):
        tags = set(q.tags)
        if "streaming" in tags or name.startswith("stream_"):
            continue
        df = q.fn(spark, SF_SMALL)
        flags = audit(name, tags, df, plan_of(df))
        if flags:
            failures[name] = flags
    assert not failures, failures
