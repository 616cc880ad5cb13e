"""Query registry backing the ``__spark_entry__.py`` driver contract.

Every operator implemented from SURVEY.md §2 registers here as a
``QuerySpec``: a name, a PySpark callable ``(spark, sf_dir) ->
DataFrame``, and (when SQL-expressible) the equivalent ANSI SQL the
DuckDB oracle runs on the same parquet tables.

Determinism conventions (the driver hash-compares values):

- Money/measure aggregates are computed in DECIMAL on BOTH sides
  (``CAST(x AS DECIMAL(18,2))`` before SUM) so floating-point
  summation order can never flip a digit; final columns are cast to an
  explicit decimal type in both engines.
- Every ORDER BY / row_number has a total tiebreak (unique key last).
- Every computed column is aliased identically in Spark and SQL.
- Timestamps: Spark session TZ pinned to UTC; DuckDB timestamps are
  naive-UTC, so values line up.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: ``@register("q1", oracle=SQL)`` on a (spark, sf_dir) fn."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregations,
        dedup,
        joins,
        multimodal,
        relational,
        relational2,
        relational3,
        similarity,
        tpch,
        text_analysis,
        windows,
    )

    _LOADED = True
