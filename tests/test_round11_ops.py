"""Round-11 operators: the CDC Rabin kernel (production twin of
text_cdc_chunking, round-10 verdict item 3) and this round's query
additions. Python references here are independent re-derivations —
never the operator's own code path — so a shared bug can't self-pass.
"""

from __future__ import annotations

import pandas as pd
import pytest

from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
    CDC_HASH_MOD,
    CDC_K,
    CDC_MASK,
    CDC_MOD,
    _cdc_rabin_batches,
    cdc_rabin_exact_sql,
    text_cdc_chunking_rabin,
)

# ------------------------------------------------ CDC Rabin kernel


def _rabin_reference(text: str):
    """Independent pure-Python chunker: per-position polynomial hash
    computed with pow() from scratch (no numpy, no prefix sums)."""
    n = len(text)
    if n == 0:
        return []
    bounds = [1]
    for pos in range(2, n - CDC_K + 2):  # 1-based, pos <= n-K+1
        h = 0
        for i in range(CDC_K):
            h = (h + ord(text[pos - 1 + i]) * pow(257, CDC_K - 1 - i, CDC_HASH_MOD)) % CDC_HASH_MOD
        if h % (CDC_MASK + 1) == 0:
            bounds.append(pos)
    out = []
    for cid, s in enumerate(bounds, start=1):
        e = bounds[cid] - 1 if cid < len(bounds) else n
        ch = sum((p - s + 1) * ord(text[p - 1]) for p in range(s, e + 1)) % CDC_MOD
        out.append((cid, s, e - s + 1, ch))
    return out


def _run_kernel(texts: list[str]) -> dict[int, list]:
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got: dict[int, list] = {}
    for out in _cdc_rabin_batches(iter([pdf])):
        for r in out.itertuples(index=False):
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.start_pos, r.n_chars, r.chunk_hash)
            )
    return got


def test_rabin_kernel_matches_python_reference():
    texts = [
        "the quick brown fox jumps over the lazy dog " * 30,
        "key agg row scan slow fast table value part hash " * 12,
        "abcdefgh",  # exactly K chars: one gram at pos 1 only
        "short",  # < K: single chunk, no gram
        "x",
        "a" * 500,  # degenerate repeated content
    ]
    got = _run_kernel(texts)
    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == _rabin_reference(t), i


def test_rabin_kernel_drops_empty_and_handles_non_ascii():
    got = _run_kernel(["", "héllo wörld — ünïcode päth " * 20])
    assert 0 not in got  # empty text yields no chunks (matches filter)
    assert sorted(got[1]) == _rabin_reference("héllo wörld — ünïcode päth " * 20)


def test_rabin_boundaries_realign_after_edit():
    """The CDC property: prepend a byte and every chunk after the
    first content boundary keeps its (length, hash) identity."""
    base = "the quick brown fox jumps over the lazy dog " * 40
    a = _rabin_reference(base)
    b = _rabin_reference("X" + base)
    assert sorted((n, h) for _, _, n, h in a[1:]) == sorted(
        (n, h) for _, _, n, h in b[1:]
    )
    assert len(a) > 3  # the fixture actually chunks


def test_rabin_kernel_matches_exact_sql_twin(spark, sf_dir):
    """kernel == SQL dual-surface pin (the fuzzy_match_damerau
    pattern): the mapInPandas production path and the explode/window
    exact-SQL formulation agree row-for-row on the real corpus."""
    a = sorted(map(tuple, text_cdc_chunking_rabin(spark, sf_dir).collect()))
    b = sorted(map(tuple, cdc_rabin_exact_sql(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_rabin_kernel_matches_exact_sql_twin_sf001(spark):
    """Same pin at the driver gate scale (sf0.01) — the round-10
    lesson: parity at ONE scale can hide precision/size traps."""
    sf = "/root/testdata/sf0.01"
    a = sorted(map(tuple, text_cdc_chunking_rabin(spark, sf).collect()))
    b = sorted(map(tuple, cdc_rabin_exact_sql(spark, sf).collect()))
    assert a == b and len(a) > 0


# ------------------------------------------------ int8-lattice k-means


def test_kmeans_int8_matches_numpy_reference(spark, sf_dir):
    """Independent exact reference: Python-int Lloyd on the same
    lattice (init, argmin-tie, rounding, empty-cluster rules
    re-derived from the spec, not the operator)."""
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        _DIM,
        _I8_SHIFT,
        KMEANS_I8_ITERS,
        KMEANS_K,
        embedding_kmeans_int8,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    rows = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .collect()
    )
    ids = sorted(r["vec_id"] for r in rows)
    codes = {
        r["vec_id"]: [
            int(np.round(np.float64(x) * _I8_SHIFT)) for x in r["embedding"]
        ]
        for r in rows
    }
    cents = [list(codes[i]) for i in ids[:KMEANS_K]]
    assign: dict[int, int] = {}
    for _ in range(KMEANS_I8_ITERS):
        for vid, q in codes.items():
            d = [
                sum((q[i] - c[i]) ** 2 for i in range(_DIM)) for c in cents
            ]
            assign[vid] = d.index(min(d))
        sums = [[0] * _DIM for _ in range(KMEANS_K)]
        ns = [0] * KMEANS_K
        for vid, cl in assign.items():
            ns[cl] += 1
            for i in range(_DIM):
                sums[cl][i] += codes[vid][i]
        for cl in range(KMEANS_K):
            if ns[cl]:
                n = ns[cl]
                cents[cl] = [
                    (2 * (sums[cl][i] + _I8_SHIFT * n) + n) // (2 * n)
                    - _I8_SHIFT
                    for i in range(_DIM)
                ]
    got = {
        r["vec_id"]: r["cluster"]
        for r in embedding_kmeans_int8(spark, sf_dir).collect()
    }
    assert got == assign
    assert len(set(got.values())) > 1  # the fixture actually clusters
