"""Cross-engine deterministic hash kernels.

``md5_window_positions`` is THE hash spec shared by every operator
that needs k independent-ish hash values both Spark and DuckDB can
compute bit-identically: k disjoint 8-hex windows of ONE md5 digest,
each parsed as an integer and reduced mod m. One hash per row instead
of k salted ones (measured 3x cheaper in interpreted HOF paths;
codegen CSEs the shared digest), and the DuckDB mirror is
``('0x' || substr(md5(x), 1 + 8*s, 8))::BIGINT % m``. Used by the
Bloom decontamination filter (bloom.py) and the count-min sketch
(aggregations.py) — keep the spec HERE so the two can never drift.

A 32-hex md5 supports up to 4 disjoint windows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_window_positions(key: Column, k: int, mod: int) -> list[Column]:
    assert 1 <= k <= 4, "md5 has 32 hex chars = at most 4 disjoint 8-hex windows"
    digest = F.md5(key)
    return [
        F.conv(F.substring(digest, 1 + 8 * s, 8), 16, 10).cast("long") % F.lit(mod)
        for s in range(k)
    ]
