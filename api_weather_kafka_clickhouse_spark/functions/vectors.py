"""Vector math over `array<float>` embedding columns (SURVEY.md §2-D3).

Built-in higher-order functions only (`zip_with` + `aggregate`): the
fold is a sequential left-to-right double accumulation, which is the
same evaluation order DuckDB's list functions use — so cosine values
are bit-identical across engines and safe to hash-compare.

At 100 TB scale these expressions run inside codegen per row; the
brute-force top-k is a broadcast of the (small) query set against the
full corpus, and the LSH/IVF variants bucket first so each row only
scores against its candidate bucket.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Rounded cosine for cross-engine ranking: double noise lives at
    ~1e-15, rounding at 1e-6 leaves 9 orders of headroom."""
    return F.round(cosine(a, b), digits)
