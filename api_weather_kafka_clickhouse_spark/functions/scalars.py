"""Scalar helpers shared across operators.

Determinism rules for the DuckDB-oracle comparison (SURVEY.md §5):

- All testdata money/measure doubles are 2-decimal exact, so
  ``CAST(x AS DECIMAL(18,2))`` is lossless in both engines and decimal
  arithmetic from there on is exact — no float-summation-order drift.
- Never SUM raw doubles (parallel reduction order is engine- and
  run-dependent); sum decimals, then derive doubles (avg, variance)
  from the exact sums with a single deterministic IEEE op.
- Avoid transcendentals (pow/ln/exp) in checked queries — libm differs
  between JVM and C++. sqrt is IEEE-exact and allowed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def money(c: Column | str) -> Column:
    """Lossless decimal view of a 2-decimal double measure."""
    return F.col(c).cast(MONEY) if isinstance(c, str) else c.cast(MONEY)


def pct(c: Column | str) -> Column:
    """Discount/tax-style 2-decimal fraction as a narrow decimal."""
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(4,2)")


def dsum(c: Column | str, out_type: str = "decimal(38,4)") -> Column:
    """Exact decimal sum with an explicit, engine-agnostic result type."""
    return F.sum(money(c)).cast(out_type)


def davg(c: Column | str) -> Column:
    """avg as exact-decimal-sum / count → one deterministic double div."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(MONEY)).cast("double") / F.count(col)
