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


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check).

    Greedy to the LAST '>' on the line: a non-greedy/[^>]* match
    would truncate at the first '>' of any nested type
    (``struct<...,embedding:array<float>,label:bigint>``) and drop
    every column after it, turning "'payload' not in schema"
    assertions into vacuous passes."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: struct<(.*)>", plan)]


def pushed_filters(df: DataFrame) -> str:
    """PushedFilters lines, each captured to the last ']' on the line
    — ``In(col, [a,b])`` predicates contain inner ']'s that a
    non-greedy match would truncate at, dropping later filters."""
    plan = formatted_plan(df)
    return "\n".join(m.group(0) for m in re.finditer(r"PushedFilters: \[.*\]", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    p = simple_plan(df)
    return "CartesianProduct" in p


# A sanctioned scalar broadcast: a BroadcastExchange whose input is a
# global (keys=[]) aggregate — by construction exactly one build row.
# Filter/Project nodes between the exchange and the aggregate preserve
# the <= 1-row bound (Catalyst inserts `Filter isnotnull(agg)` when the
# scalar feeds a join condition — q11/q22's HAVING-fraction shape), so
# up to two such pass-through lines are looked through.
_SCALAR_BROADCAST_BUILD = re.compile(
    r"BroadcastExchange IdentityBroadcastMode[^\n]*\n"
    r"(?:[^\n]*\b(?:Filter|Project)\b[^\n]*\n){0,2}"
    r"[^\n]*(?:Hash|Sort|ObjectHash)Aggregate\((?:keys|key)=\[\]"
)


def unbounded_nested_loop_count(df: DataFrame) -> int:
    """# of nested-loop join nodes that are NOT the sanctioned
    scalar-broadcast shape (build side = a single-row keys=[] global
    aggregate).

    ``CartesianProduct`` always counts. ``BroadcastNestedLoopJoin`` is
    exempt only when its broadcast input is a global aggregate: Spark
    plans ``crossJoin(broadcast(one_row_total))`` as
    ``BroadcastNestedLoopJoin BuildRight, Cross``, and with exactly one
    build row the "nested loop" degenerates to a map-side column
    append — scale-safe (SCALE.md: "the only cartesians are
    broadcast-of-1-row totals"). A broadcast of a real multi-row
    relation, or a non-broadcast nested loop, still counts: those are
    the O(n·m) shapes the plan tests exist to forbid.
    """
    plan = simple_plan(df)
    cartesians = plan.count("CartesianProduct")
    bnlj = plan.count("NestedLoopJoin")
    # CartesianProduct has no broadcast build, so scalar exemptions can
    # only ever discount BroadcastNestedLoopJoin nodes
    exempt = min(len(_SCALAR_BROADCAST_BUILD.findall(plan)), bnlj)
    return cartesians + bnlj - exempt


def partial_aggregate_count(df: DataFrame) -> int:
    """# of map-side partial aggregate nodes in the plan.

    Counted from the node's function list (``functions=[partial_``)
    rather than node-name arithmetic: the old ``HashAggregate``//2
    heuristic substring-matched ObjectHashAggregate, assumed exactly
    two nodes per logical aggregate (distinct aggregates plan four),
    and missed SortAggregate fallbacks entirely."""
    return simple_plan(df).count("functions=[partial_")


def shuffle_count(df: DataFrame) -> int:
    """# of SHUFFLE exchanges. ``\\bExchange\\b`` — a plain substring
    count would also match BroadcastExchange and report shuffles in a
    genuinely shuffle-free broadcast-join plan."""
    return len(re.findall(r"\bExchange\b", simple_plan(df)))
