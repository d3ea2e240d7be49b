"""Plan-inspection helpers: assert that Catalyst did what the design
relies on (pushdown, broadcast, TakeOrdered) — used by tests so plan
regressions fail loudly instead of silently costing a full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The parquet scan must carry a pushed filter mentioning `fragment`."""
    plan = physical_plan(df)
    assert "PushedFilters" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), "\n".join(pushed)


def assert_broadcast_join(df: DataFrame) -> None:
    assert "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def assert_take_ordered(df: DataFrame) -> None:
    """orderBy().limit(k) must compile to TakeOrderedAndProject, not a
    global sort."""
    assert "TakeOrderedAndProject" in physical_plan(df), physical_plan(df)


def assert_partition_pruned(df: DataFrame, col: str) -> None:
    """A filter on a physical partition column must appear as a
    PartitionFilter on the scan (directory-level pruning), not as a data
    filter evaluated after reading every file."""
    plan = physical_plan(df)
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert lines, plan
    assert any(col in ln for ln in lines), "\n".join(lines)
