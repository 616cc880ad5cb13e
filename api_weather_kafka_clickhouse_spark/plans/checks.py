"""Physical-plan inspection helpers (SURVEY.md §4).

The 100 TB design rules are checkable properties of the plan, not
vibes; tests/test_plans.py asserts them per operator:

- filters/column pruning reach the parquet scan (PushedFilters /
  ReadSchema);
- dimension joins are broadcast (BroadcastHashJoin), fact joins are
  shuffle hash/sort-merge;
- aggregates have a map-side partial phase before the shuffle;
- no cartesian products sneak in where an equi-key exists.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.append(m.group(1))
    return cols


def pushed_filters(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(m.group(0) for m in re.finditer(r"PushedFilters: \[[^\]]*\]", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    p = simple_plan(df)
    return "CartesianProduct" in p


def partial_aggregate_count(df: DataFrame) -> int:
    """# of map-side partial hash aggregates in the plan."""
    return len(re.findall(r"HashAggregate", simple_plan(df))) // 2


def shuffle_count(df: DataFrame) -> int:
    return simple_plan(df).count("Exchange")
