"""TPC-DS-shape relational family (plans/pipeline128.py): oracle parity
at sf0.001 plus the plan-shape claims each docstring makes (sf0.01 is
the driver's scale, covered by tools/drive_contract.py)."""

from __future__ import annotations

from multithreaded_map_reduce_library_spark.plans.registry import all_queries

from .conftest import SF_SMALL
from .oracle_util import compare_query
from .test_plan_shapes import plan_str


def _q(name):
    return all_queries()[name]


def test_channel_union_star_parity(spark):
    q = _q("tpcds_channel_union_star")
    compare_query(spark, q.fn, q.oracle, SF_SMALL)


def test_rollup_topk_parity(spark):
    q = _q("tpcds_rollup_topk_windowed")
    compare_query(spark, q.fn, q.oracle, SF_SMALL)


def test_cross_channel_intersect_parity(spark):
    q = _q("tpcds_cross_channel_intersect")
    compare_query(spark, q.fn, q.oracle, SF_SMALL)


def test_union_star_aggregates_not_raw_union(spark):
    """The rollup over the 3-channel union must plan as Expand →
    partial HashAggregate → ONE exchange on the rollup keys; the union
    itself must not shuffle raw fact rows."""
    plan = plan_str(_q("tpcds_channel_union_star").fn(spark, SF_SMALL))
    assert "Expand" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert "Union" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rollup_topk_broadcasts_dim_and_limits_window(spark):
    """part is a broadcast dim; the rank window runs on the rollup
    lattice (partitioned by lvl), with the rank-3 filter pushed into
    the window operator where the runtime supports it."""
    plan = plan_str(_q("tpcds_rollup_topk_windowed").fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan
    assert "Expand" in plan, plan
    assert "Window" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_intersect_plans_as_semi_anti_joins(spark):
    """INTERSECT / EXCEPT must become left-semi / left-anti hash joins
    over already-distinct key sets — never a row-multiplying join."""
    plan = plan_str(_q("tpcds_cross_channel_intersect").fn(spark, SF_SMALL))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_intersect_counts_are_consistent(spark):
    row = _q("tpcds_cross_channel_intersect").fn(spark, SF_SMALL).collect()[0]
    assert row["n_all_eras"] <= min(row["n_era1"], row["n_era2"], row["n_era3"])
    assert row["n_era1_only"] <= row["n_era1"]
    assert row["n_all_eras"] + row["n_era1_only"] <= row["n_era1"]
