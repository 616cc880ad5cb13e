"""Bloom-filter decontamination (operators/bloom.py) beyond the
oracle-parity row it gets in test_oracle_parity.py: the zero-false-
negative guarantee vs the exact join, determinism of the bitset build,
the zero-shuffle plan claim, and the streaming-composable keep flag."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M,
    _bits_literal,
    bloom_hit_count,
    build_bloom_bits,
    decontam_filter,
    decontaminate_bloom,
    eval_bloom_bits,
)
from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
    decontaminate_ngram_overlap,
)
from api_weather_kafka_clickhouse_spark.plans import checks


def test_bloom_superset_of_exact(spark, sf_dir):
    """Bloom membership can never miss a truly-present gram: every doc
    the exact-join decontamination flags must be flagged by the Bloom
    pass with at least as many hit grams."""
    exact = {
        r["doc_id"]: r["n_hit_grams"]
        for r in decontaminate_ngram_overlap(spark, sf_dir).collect()
    }
    bloomed = {
        r["doc_id"]: r["n_hit_grams"] for r in decontaminate_bloom(spark, sf_dir).collect()
    }
    assert set(exact) <= set(bloomed)
    for doc_id, n in exact.items():
        assert bloomed[doc_id] >= n
    # and the FP overhead is a filter property, not a flood: the
    # flagged set stays the same order of magnitude as the exact set
    assert len(bloomed) <= 2 * len(exact) + 8


def test_bitset_build_deterministic_and_bounded(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators import bloom as B

    b1 = eval_bloom_bits(spark, sf_dir)
    # determinism must be asserted against a FRESH distributed build,
    # not the per-dataset cache (which would compare b1 to itself)
    B._BITS_CACHE.clear()
    b2 = eval_bloom_bits(spark, sf_dir)
    assert b1 == b2
    assert len(b1) == BLOOM_M // 8  # bytes
    n_set = sum(bin(b).count("1") for b in b1)
    assert 0 < n_set <= BLOOM_M


def test_corpus_side_plan_shape(spark, sf_dir):
    """No gram join anywhere: membership is a codegen filter on the
    one-Literal bitset, so the only corpus-sized exchange is the gram
    window (shared with the exact operator); the flagged-doc metadata
    join broadcasts."""
    df = decontaminate_bloom(spark, sf_dir)
    assert checks.shuffle_count(df) <= 2
    assert not checks.has_cartesian(df)
    assert checks.has_broadcast_join(df)  # metadata joins the small hit set


def test_hit_count_exact_on_crafted_grams(spark):
    """Plant a known eval gram set and check per-doc hit counts and
    the composable filter on crafted corpus docs."""
    grams = spark.createDataFrame(
        [("one two three four",), ("five six seven eight",)], "gram string"
    )
    bits = build_bloom_bits(grams)
    docs = spark.createDataFrame(
        [
            # contains eval gram 1 exactly once (distinct grams)
            (1, "zz one two three four zz"),
            # contains both eval grams
            (2, "one two three four five six seven eight"),
            # 4-gram window never matches (different order)
            (3, "four three two one padding words here"),
            # too short for any 4-gram
            (4, "one two three"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bloom_hit_count(F.col("text"), _bits_literal(bits)).alias("n")
        ).collect()
    }
    assert out[1] == 1
    assert out[2] >= 2  # both planted grams (+ possible FP bridge grams)
    assert out[3] == 0
    assert out[4] == 0
    kept = sorted(r["doc_id"] for r in decontam_filter(docs, bits).collect())
    assert kept == [3, 4]


def test_streaming_composable_pure_filter(spark):
    """decontam_filter is a stateless narrow filter: applying it to a
    streaming DataFrame must not require state or output-mode changes
    — proxied here by the batch plan having no exchange and no
    aggregation at all."""
    grams = spark.createDataFrame([("a b c d",)], "gram string")
    bits = build_bloom_bits(grams)
    docs = spark.createDataFrame([(1, "a b c d e"), (2, "e f g h i")], "doc_id bigint, text string")
    out = decontam_filter(docs, bits)
    assert checks.shuffle_count(out) == 0
    assert "Aggregate" not in checks.simple_plan(out)
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_positions_cover_full_range_property(spark):
    """Bit positions derived from md5 must land in [0, BLOOM_M) for
    arbitrary gram content, including unicode and quotes."""
    rows = [("gr'am \"q\" éü",), ("",), ("a" * 500,)]
    grams = spark.createDataFrame(rows, "gram string")
    from api_weather_kafka_clickhouse_spark.operators.bloom import bloom_positions

    out = grams.select(F.array(*bloom_positions(F.col("gram"))).alias("p")).collect()
    for r in out:
        assert len(r["p"]) == BLOOM_K
        for p in r["p"]:
            assert 0 <= p < BLOOM_M
