"""Registry-wide physical-plan audit as a regression net: every batch
query's plan is checked for the shapes that break at 100 TB (accidental
cartesian products, unexplained single-partition exchanges, Python eval
nodes in JVM-only queries, non-scalar nested-loop joins). tools/
plan_audit.py is the same audit as a CLI."""

from __future__ import annotations

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tools.plan_audit import audit, plan_of

from .conftest import SF_SMALL


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
