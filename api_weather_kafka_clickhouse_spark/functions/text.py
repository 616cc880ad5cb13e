"""Text-analysis column builders (SURVEY.md §2-D4).

Everything here is built-in `pyspark.sql.functions` (JVM-side, inside
whole-stage codegen) — no Python UDFs in the hot path, so these run at
scan speed on a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic English stopword list used by quality scoring and
# the language-ID heuristic. Kept in one place so Spark and oracle SQL
# stay in lockstep (tests format it into the DuckDB SQL).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; identical to DuckDB string_split."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column | str) -> Column:
    """# tokens that are stopwords — `filter` higher-order fn, no UDF."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles as an array column.

    `transform(sequence(...))` keeps shingling inside codegen; at 100 TB
    this runs per-row with no shuffle and feeds the dedup operators.
    """
    w = tokens(text)
    # element_at is 1-based; sequence(1, size-k+1) yields start offsets.
    # Guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty array, not a clamped bound.
    joined = F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(joined)


def quality_score(text: Column | str) -> Column:
    """Deterministic 0..1 heuristic: length band * stopword presence.

    Mirrors common LLM-corpus quality filters (length + stopword-ratio
    bands) with exact integer/decimal arithmetic so the oracle matches.
    """
    nt = n_tokens(text)
    sw = stopword_hits(text)
    len_component = F.least(nt, F.lit(100)).cast("double") / F.lit(100.0)
    sw_ratio = sw.cast("double") / nt.cast("double")
    sw_component = F.when(sw_ratio > 0.05, F.lit(1.0)).otherwise(F.lit(0.5))
    return len_component * sw_component
