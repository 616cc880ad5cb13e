"""In-engine logistic-regression quality scorer (operators/
quality_model.py): optimization sanity (monotone loss), distillation
quality (rule-class separation/accuracy), and crafted junk-vs-clean
ordering on a synthetic frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators.corpus_quality import gopher_keep
from api_weather_kafka_clickhouse_spark.operators.quality_model import (
    logreg_fit,
    quality_features,
    quality_lr_score,
)
from api_weather_kafka_clickhouse_spark.tables import load


def _feats(docs):
    return docs.select(
        "doc_id",
        gopher_keep().cast("double").alias("y"),
        quality_features().alias("x"),
    )


def test_loss_decreases_monotonically(spark, sf_dir):
    d = load(spark, "documents", sf_dir)
    _, hist = logreg_fit(_feats(d).persist())
    assert len(hist) > 1
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1)), hist
    # and it actually learned something, not just wiggled
    assert hist[-1] < 0.7 * hist[0]


def test_scores_separate_rule_classes(spark, sf_dir):
    d = load(spark, "documents", sf_dir)
    out = quality_lr_score(d).toPandas()
    assert len(out) == d.count()
    pos = out[out.rule_keep == 1].quality_prob
    neg = out[out.rule_keep == 0].quality_prob
    assert len(pos) > 0 and len(neg) > 0
    # measured: mean 0.70 vs 0.41, accuracy 0.926 at sf0.001
    assert pos.mean() > neg.mean() + 0.15
    acc = ((out.quality_prob >= 0.5).astype(int) == out.rule_keep).mean()
    assert acc >= 0.85, acc


def test_crafted_junk_scores_below_clean(spark):
    clean = " ".join(f"alpha{i % 7} beta gamma the of wordy" for i in range(10))
    junk_symbols = " ".join("## ###" for _ in range(30))
    junk_numbers = " ".join("12345 67890" for _ in range(30))
    short = "too short"
    rows = []
    # enough of each class that the fit is meaningful
    for i in range(10):
        rows.append((i, clean + f" tail{i}"))
        rows.append((100 + i, junk_symbols))
        rows.append((200 + i, junk_numbers))
        rows.append((300 + i, short))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["quality_prob"] for r in quality_lr_score(docs).collect()}
    clean_mean = sum(out[i] for i in range(10)) / 10
    junk_mean = sum(v for k, v in out.items() if k >= 100) / 30
    assert clean_mean > junk_mean


def test_quality_weighted_sampling(spark, sf_dir):
    """Deterministic kernel + quality correlation: two runs agree
    exactly, kept docs skew high-quality, and inv_p is bounded by the
    probability floor."""
    from api_weather_kafka_clickhouse_spark.operators.quality_model import (
        WQ_FLOOR,
        sample_by_quality,
        sample_quality_weighted,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    d = load(spark, "documents", sf_dir)
    scored = quality_lr_score(d).persist()
    try:
        a = {r.doc_id for r in sample_by_quality(scored).collect()}
        b = {r.doc_id for r in sample_by_quality(scored).collect()}
        assert a == b
        rows = scored.collect()
        kept_rate_hi = sum(1 for r in rows if r.quality_prob >= 0.5 and r.doc_id in a) / max(
            1, sum(1 for r in rows if r.quality_prob >= 0.5)
        )
        kept_rate_lo = sum(1 for r in rows if r.quality_prob < 0.5 and r.doc_id in a) / max(
            1, sum(1 for r in rows if r.quality_prob < 0.5)
        )
        assert kept_rate_hi > kept_rate_lo
        for r in sample_by_quality(scored).collect():
            assert r.inv_p <= 1.0 / WQ_FLOOR + 1e-9
            assert r.p >= WQ_FLOOR
    finally:
        scored.unpersist()
    # registered query runs end to end (training included)
    assert sample_quality_weighted(spark, sf_dir).count() > 0
