"""Property tests for the round-11-continuation pure kernels: the
LTTB selection, the Viterbi carried-path fold (re-derived here in
Python and checked against the textbook backpointer formulation), and
the phonetic blocking key. No Spark session needed — these pin the
ALGORITHMS both engines share, over a far wider input space than the
fixed test corpus reaches."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_round11b_ops import (
    _dtw_2d,
    _lttb_reference,
    _phonetic_key,
    _viterbi_backpointer,
)

# ------------------------------------------------ LTTB properties


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 10**12), min_size=1, max_size=120))
def test_lttb_selection_is_valid(ys):
    sel = _lttb_reference(ys, 12)
    n = len(ys)
    assert sel[0] == 1 and sel[-1] == n if n > 1 else sel == [1]
    assert sel == sorted(sel)  # left-to-right
    assert len(sel) == len(set(sel))  # no duplicates
    assert len(sel) == (n if n <= 12 else 12)
    assert all(1 <= x <= n for x in sel)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=13, max_size=60))
def test_lttb_keeps_one_point_per_bucket(ys):
    sel = _lttb_reference(ys, 12)
    n, b = len(ys), 10
    # interior picks land in their buckets, in order
    for k, x in enumerate(sel[1:-1], start=1):
        lo = 2 + ((k - 1) * (n - 2)) // b
        hi = 1 + (k * (n - 2)) // b
        assert lo <= x <= hi


# ------------------------------------------------ Viterbi fold == backtrack


def _viterbi_carried_paths(obs, start_mu, trans_mu, emit_mu):
    """The operators' formulation: both candidate paths ride the fold
    (no backpointer matrix, no reverse pass)."""
    s0 = start_mu[0] + emit_mu[0][obs[0]]
    s1 = start_mu[1] + emit_mu[1][obs[0]]
    p0, p1 = [0], [1]
    for sym in obs[1:]:
        c00, c10 = s0 + trans_mu[(0, 0)], s1 + trans_mu[(1, 0)]
        c01, c11 = s0 + trans_mu[(0, 1)], s1 + trans_mu[(1, 1)]
        ns0 = max(c00, c10) + emit_mu[0][sym]
        ns1 = max(c01, c11) + emit_mu[1][sym]
        np0 = (p0 if c00 >= c10 else p1) + [0]
        np1 = (p0 if c01 >= c11 else p1) + [1]
        s0, s1, p0, p1 = ns0, ns1, np0, np1
    if s1 > s0:
        return s1, p1
    return s0, p0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(["view", "click", "purchase", "signup", "error"]),
        min_size=1,
        max_size=40,
    )
)
def test_viterbi_fold_equals_backpointer(obs):
    from api_weather_kafka_clickhouse_spark.operators.stats import (
        HMM_EMIT_MU,
        HMM_START_MU,
        HMM_TRANS_MU,
    )

    sa, pa = _viterbi_carried_paths(obs, HMM_START_MU, HMM_TRANS_MU, HMM_EMIT_MU)
    sb, pb = _viterbi_backpointer(obs, HMM_START_MU, HMM_TRANS_MU, HMM_EMIT_MU)
    assert sa == sb
    assert pa == pb  # identical tie rules -> identical PATH, not just score


# ------------------------------------------------ DTW properties


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=15),
    st.lists(st.integers(0, 1000), min_size=1, max_size=15),
)
def test_dtw_symmetry_and_bounds(a, b):
    d = _dtw_2d(a, b)
    assert d == _dtw_2d(b, a)  # |.| cost is symmetric
    assert d >= 0
    if a == b:
        assert d == 0
    # DTW with free warping is never worse than the aligned L1 when
    # lengths match (alignment is one admissible path)
    if len(a) == len(b):
        assert d <= sum(abs(x - y) for x, y in zip(a, b))


# ------------------------------------------------ phonetic key format


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=20))
def test_phonetic_key_shape_and_determinism(word):
    k = _phonetic_key(word)
    assert len(k) == 4
    assert k[0] == word[0].upper()
    assert all(c in "1234560" for c in k[1:])
    assert k == _phonetic_key(word)  # pure function
