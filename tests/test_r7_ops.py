"""Round-7 operator semantics (beyond the DuckDB oracle parity that
tests/test_oracle_parity.py already enforces for all four):
join_bloom_prefilter equals the plain semi-join and actually prunes at
the scan, split_kfold is stable and spans all folds, temperature
weights normalize and boost rare sources, exact percentiles match
numpy's interpolation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators.aggregations import agg_percentile_exact
from api_weather_kafka_clickhouse_spark.operators.joins import (
    BLOOM_JOIN_NATION,
    join_bloom_prefilter,
)
from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
    K_FOLDS,
    TEMP_ALPHA,
    sample_temperature,
    split_kfold,
)
from api_weather_kafka_clickhouse_spark.tables import load


def test_bloom_prefilter_equals_plain_semijoin(spark, sf_dir):
    got = {
        (r.suppkey, r.n_items, round(r.revenue, 2))
        for r in join_bloom_prefilter(spark, sf_dir).collect()
    }
    li = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    keep = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .filter(F.col("n_name") == BLOOM_JOIN_NATION)
        .select("s_suppkey")
    )
    plain = (
        li.join(keep, li.l_suppkey == keep.s_suppkey, "left_semi")
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    want = {(r.suppkey, r.n_items, round(r.revenue, 2)) for r in plain.collect()}
    assert got == want and got


def test_bloom_prefilter_is_a_scan_filter_not_a_join(spark, sf_dir):
    """The membership probe must appear as a Filter in the physical
    plan (scan-side pruning), with no extra join for it — only the
    exact FP-removal semi-join remains."""
    plan = join_bloom_prefilter(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") <= 4  # semi-join + the dim build side
    assert "getbit" in plan.lower() or "Filter" in plan


def test_kfold_stable_and_spans_all_folds(spark, sf_dir):
    a = {(r.doc_id, r.fold) for r in split_kfold(spark, sf_dir).collect()}
    b = {(r.doc_id, r.fold) for r in split_kfold(spark, sf_dir).collect()}
    assert a == b
    folds = {f for _, f in a}
    assert folds == set(range(K_FOLDS))
    # roughly balanced: no fold under half or over double its share
    import collections

    counts = collections.Counter(f for _, f in a)
    n = sum(counts.values())
    for f in range(K_FOLDS):
        assert n / (2 * K_FOLDS) < counts[f] < 2 * n / K_FOLDS, counts


def test_temperature_weights_normalize_and_boost_rare(spark, sf_dir):
    rows = sample_temperature(spark, sf_dir).collect()
    assert abs(sum(r.w_temp for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-3
    rare = min(rows, key=lambda r: r.n_docs)
    common = max(rows, key=lambda r: r.n_docs)
    if rare.n_docs < common.n_docs:  # corpus actually skewed
        assert rare.boost > common.boost
        assert rare.boost > 1.0
    # alpha=1 would be the identity; sanity-pin the exponent in use
    assert 0 < TEMP_ALPHA < 1


def test_percentiles_match_numpy(spark, sf_dir):
    rows = agg_percentile_exact(spark, sf_dir).collect()
    e = load(spark, "events", sf_dir).select("event_type", "value").toPandas()
    for r in rows:
        vals = e[e.event_type == r.event_type]["value"].to_numpy()
        for p, got in ((25, r.p25), (50, r.p50), (75, r.p75), (90, r.p90)):
            want = float(np.percentile(vals, p))  # linear interpolation
            assert abs(got - want) < 1e-5, (r.event_type, p, got, want)
