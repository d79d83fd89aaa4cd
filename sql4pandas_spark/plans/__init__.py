"""Physical-plan introspection helpers — the build's scale feedback loop.

Used by tests/test_plans.py to pin the plan properties that matter at 100 TB:
filters pushed to the parquet scan, pruned read schemas, broadcast joins for
dimension tables, bounded exchange (shuffle) counts, wide whole-stage-codegen
spans. A query that passes correctness but loses one of these properties is a
regression even if its local runtime looks fine.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text for assertions/logging (captured from the
    public df.explain API)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the physical plan (distinct operator
    ids — formatted output mentions each operator in both the tree and the
    details section)."""
    import re

    plan = formatted_plan(df)
    ids = set(re.findall(r"Exchange \((\d+)\)", plan))
    ids |= set(re.findall(r"\((\d+)\) Exchange", plan))
    return len(ids)


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True if the parquet scan received pushed-down filters (optionally
    containing `fragment`, e.g. a column name)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line.replace(" ", ""):
            if fragment is None or fragment in line:
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema (column-pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inside = line.split("struct<", 1)
            if len(inside) == 2:
                body = inside[1].rsplit(">", 1)[0]
                cols += [c.split(":")[0].strip() for c in body.split(",") if ":" in c]
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_partition_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True if the file scan carries a non-empty PartitionFilters list
    (optionally containing `fragment`, e.g. the partition column name).

    On a hive-partitioned layout this is the difference between listing a
    handful of directories and scanning every file of a 100 TB table."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PartitionFilters" in line and "[]" not in line.replace(" ", ""):
            if fragment is None or fragment in line:
                return True
    return False
