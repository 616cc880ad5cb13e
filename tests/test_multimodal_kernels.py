"""Property tests for the multimodal Arrow-batch kernels (pure
pandas/numpy — no Spark session needed).

Regression guard for the empty-segment class of bug: segment sums via
index-clipped reduceat silently corrupted the document BEFORE a
trailing empty payload; the prefix-sum implementation must match a
per-row Python reference for every payload shape, empties anywhere."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from api_weather_kafka_clickhouse_spark.operators.multimodal import (
    ADLER_MOD,
    RESIZE_STRIDE,
    _extract_batch,
    _resize_batch,
)

payloads_strategy = st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=12)


def _run(kernel, payloads):
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    out = pd.concat(list(kernel(iter([pdf])))) if len(payloads) else None
    return out


@settings(max_examples=200, deadline=None)
@given(payloads_strategy)
def test_extract_batch_matches_python_reference(payloads):
    out = _run(_extract_batch, payloads)
    if out is None:
        return
    for i, b in enumerate(payloads):
        row = out.iloc[i]
        assert row["n_bytes"] == len(b)
        assert row["checksum"] == sum(b) % ADLER_MOD
        assert row["head_byte"] == (b[0] if b else -1)
        assert row["tail_byte"] == (b[-1] if b else -1)


@settings(max_examples=200, deadline=None)
@given(payloads_strategy)
def test_resize_batch_matches_python_reference(payloads):
    out = _run(_resize_batch, payloads)
    if out is None:
        return
    for i, b in enumerate(payloads):
        row = out.iloc[i]
        sampled = b[::RESIZE_STRIDE]
        assert row["n_bytes_in"] == len(b)
        assert row["n_bytes_out"] == len(sampled)
        assert row["out_checksum"] == sum(sampled) % ADLER_MOD
