"""Physical-plan inspection helpers.

The reference trusts DuckDB's optimizer blindly; at 100 TB we can't —
these helpers turn `.explain("formatted")` into assertions so tests
lock in the physical properties that matter (filter pushdown, column
pruning, broadcast vs shuffle joins, partition pruning).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — the column-pruning check."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":")[0].strip()
            for c in m.group(1).split(",")
            if c.strip()
        ]
        out.append(cols)
    return out


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, (
        f"expected ≥{at_least} BroadcastHashJoin, found {n}:\n{plan}"
    )


def assert_no_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" not in plan, plan


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters from file scans — the partition-pruning check."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out
