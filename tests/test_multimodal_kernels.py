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


def test_phash_near_dup_detection(spark):
    """Planted payloads: identical and same-length-edited payloads
    pair up within the Hamming radius; unrelated content stays far."""
    from pyspark.sql import functions as F

    from api_weather_kafka_clickhouse_spark.operators.multimodal import (
        PHASH_MAX_HAMMING,
        phash_pairs,
        phash_signatures,
    )

    base = ("alpha bravo charlie delta " * 40).strip()
    edit = base[:50] + "X" + base[51:]  # same length, one byte
    other = ("zulu yankee xray whiskey " * 40).strip()
    docs = spark.createDataFrame(
        [(1, base), (2, edit), (3, other), (4, base)], "doc_id bigint, text string"
    )
    bt = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    sigs = phash_signatures(bt)
    by_id = {r.doc_id: r.phash for r in sigs.collect()}
    assert by_id[1] == by_id[4]  # identical payloads -> identical hash
    assert bin(by_id[1] ^ by_id[2]).count("1") <= PHASH_MAX_HAMMING
    assert bin(by_id[1] ^ by_id[3]).count("1") > PHASH_MAX_HAMMING
    pairs = {(r.doc_a, r.doc_b) for r in phash_pairs(sigs).collect()}
    assert pairs == {(1, 2), (1, 4), (2, 4)}


def test_phash_banding_matches_bruteforce(spark):
    """Pigeonhole guarantee: the banded join finds EXACTLY the pairs a
    brute-force Hamming scan finds at radius <= 3 (4 bands x 16 bits
    -> any pair within 3 flips shares a band)."""
    import itertools

    from pyspark.sql import functions as F

    from api_weather_kafka_clickhouse_spark.operators.multimodal import (
        PHASH_MAX_HAMMING,
        phash_pairs,
        phash_signatures,
    )

    texts = []
    base = ("lorem ipsum dolor sit amet " * 30).strip()
    for i in range(12):
        # same-length perturbations at varying positions/extents
        t = list(base)
        for j in range(i):
            t[7 * j % len(t)] = "Q"
        texts.append((i, "".join(t)))
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    bt = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    sigs = phash_signatures(bt)
    by_id = {r.doc_id: r.phash for r in sigs.collect()}
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(by_id), 2)
        if bin(by_id[a] ^ by_id[b]).count("1") <= PHASH_MAX_HAMMING
    }
    banded = {(r.doc_a, r.doc_b) for r in phash_pairs(sigs).collect()}
    assert banded == brute
    assert len(brute) > 0  # the fixture actually exercises the radius


def test_phash_signatures_deterministic_and_registered(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.multimodal import (
        mm_phash_signatures,
    )

    a = {(r.doc_id, r.phash) for r in mm_phash_signatures(spark, sf_dir).collect()}
    b = {(r.doc_id, r.phash) for r in mm_phash_signatures(spark, sf_dir).collect()}
    assert a == b
    assert len(a) == 500
