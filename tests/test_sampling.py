"""Sampling/split operator guarantees beyond the driver checks."""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
    sample_stratified,
    split_train_holdout,
)
from api_weather_kafka_clickhouse_spark.tables import load


def test_stratified_sample_is_seeded_and_proportional(spark, sf_dir):
    a = {r.doc_id for r in sample_stratified(spark, sf_dir).collect()}
    b = {r.doc_id for r in sample_stratified(spark, sf_dir).collect()}
    assert a == b, "fixed seed must reproduce the same sample"

    totals = {
        r.lang: r.n
        for r in load(spark, "documents", sf_dir).groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    sampled = {
        r.lang: r.n
        for r in sample_stratified(spark, sf_dir).groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    # Bernoulli sampling: loose 3-sigma-ish band on small strata
    expected = {"en": 0.25, "zh": 0.8, "es": 0.8, "de": 0.8, "fr": 0.8}
    for lang, frac in expected.items():
        got = sampled.get(lang, 0) / totals[lang]
        assert abs(got - frac) < 0.35, (lang, got, frac)


def test_split_is_stable_and_roughly_80_20(spark, sf_dir):
    out = split_train_holdout(spark, sf_dir)
    counts = {r.split: r[1] for r in out.groupBy("split").count().collect()}
    total = sum(counts.values())
    assert 0.6 < counts.get("train", 0) / total < 0.95
    # stability: same assignment on a rerun
    again = split_train_holdout(spark, sf_dir)
    assert {(r.doc_id, r.split) for r in out.collect()} == {
        (r.doc_id, r.split) for r in again.collect()
    }
