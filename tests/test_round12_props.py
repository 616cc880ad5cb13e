"""Property tests for the round-12 pure kernels: the MaxSim einsum
identity, the truncated-division law shared by the alpha-beta filter's
two engines, the bitmap-word distinct identity, and the rational
critical-value pins. No Spark session needed — these pin the
ALGORITHMS both engines share, over a far wider input space than the
fixed test corpus reaches."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------ MaxSim einsum identity


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 6),  # number of docs in the batch
)
def test_maxsim_einsum_equals_loop(seed, n_docs):
    rng = np.random.default_rng(seed)
    q = rng.integers(-127, 128, size=(3, 8, 8), dtype=np.int64)
    d = rng.integers(-127, 128, size=(n_docs, 8, 8), dtype=np.int64)
    inter = np.einsum("qsd,btd->qbst", q, d)
    fast = inter.max(axis=3).sum(axis=2)
    for qi in range(3):
        for bi in range(n_docs):
            slow = sum(
                max(int(q[qi, s] @ d[bi, t]) for t in range(8))
                for s in range(8)
            )
            assert fast[qi, bi] == slow


def test_maxsim_int64_stays_exact_at_extremes():
    # |dot| <= 8 * 127 * 127; max over 8, summed over 8 — far inside
    # int64, and the einsum path must not overflow or upcast to float
    q = np.full((1, 8, 8), 127, dtype=np.int64)
    d = np.full((1, 8, 8), 127, dtype=np.int64)
    inter = np.einsum("qsd,btd->qbst", q, d)
    assert inter.dtype == np.int64
    assert inter.max(axis=3).sum(axis=2)[0, 0] == 8 * (8 * 127 * 127)


# ------------------------------------------------ truncated-division law


@settings(max_examples=300, deadline=None)
@given(st.integers(-(10**12), 10**12), st.sampled_from([4, 16]))
def test_trunc_div_formula_matches_python_trunc(r, den):
    """(r - r % den) / den with sign-of-dividend %, the formula BOTH
    engines execute in time_alpha_beta_filter, equals truncation
    toward zero (and differs from floor for negative remainders)."""
    # Python % is floor-signed; emulate the engines' dividend-signed %
    rem = r - int(r / den) * den  # trunc remainder, sign of dividend
    got = (r - rem) / den
    assert got == int(r / den)
    # and the quotient is always exactly representable
    assert float(got).is_integer()


@settings(max_examples=200, deadline=None)
@given(st.integers(-(10**9), 10**9), st.sampled_from([4, 16]))
def test_trunc_div_matches_duckdb_expression(r, den):
    import duckdb

    got = duckdb.sql(
        f"SELECT CAST(({r} - ({r}) % {den}) / {den} AS BIGINT)"
    ).fetchone()[0]
    assert got == int(r / den)


# ------------------------------------------------ bitmap-word distinct


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=300))
def test_bitmap_word_popcount_equals_set_cardinality(ids):
    words: dict[int, int] = {}
    for i in ids:
        words[i >> 6] = words.get(i >> 6, 0) | (1 << (i & 63))
    popcount = sum(bin(w).count("1") for w in words.values())
    assert popcount == len(set(ids))
    assert len(words) == len({i >> 6 for i in ids})


def test_bitmap_bit63_survives_signed_long_in_duckdb():
    """id % 64 == 63 sets the sign bit of a 64-bit integer; popcount
    of the two's-complement word must still count it once. NOTE:
    DuckDB raises on `1::BIGINT << 63` (overflow) where Spark's
    shiftleft silently wraps to min-long — pinned here because it is
    exactly why agg_bitmap_distinct's oracle uses count(DISTINCT)
    rather than mirroring the shift. The Spark twin lives in
    test_round12_ops.py (needs the session)."""
    import duckdb
    import pytest as _pytest

    got = duckdb.sql(
        "SELECT bit_count(((-9223372036854775807 - 1) | 1)::BIGINT)"
    ).fetchone()
    assert got == (2,)
    with _pytest.raises(duckdb.OutOfRangeException):
        duckdb.sql("SELECT 1::BIGINT << 63").fetchall()


# ------------------------------------------------ rational-literal pins


def test_ca_rational_tighter_than_micro_literal():
    crit = 3.8414588206941254  # chi2(1).ppf(0.95)
    assert abs(10322 / 2687 - crit) < 6e-8
    assert abs(10322 / 2687 - crit) < abs(3_841_459 / 1e6 - crit)


def test_decay_table_monotone_and_pinned():
    from api_weather_kafka_clickhouse_spark.operators.relational2 import DECAY_W

    assert DECAY_W[0] == (0, 1_000_000)
    weights = [w for _, w in DECAY_W]
    assert all(a >= b for a, b in zip(weights, weights[1:]))
    assert weights[-1] >= 0 and len(DECAY_W) == 64


def test_sprt_boundaries_and_increments_consistent():
    import math

    from api_weather_kafka_clickhouse_spark.operators.stats import (
        SPRT_A_MU,
        SPRT_B_MU,
        SPRT_F_MU,
        SPRT_S_MU,
    )

    assert SPRT_A_MU == -SPRT_B_MU == round(math.log(19) * 1e6)
    assert SPRT_S_MU > 0 > SPRT_F_MU
    # a success step can never cross BOTH boundaries at once
    assert SPRT_S_MU < 2 * SPRT_A_MU
