"""Sketch-operator guarantees: HLL estimates must sit within their
published error bounds of the exact answers, including after merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators.aggregations import agg_hll_sketch_merge
from api_weather_kafka_clickhouse_spark.tables import load


def test_hll_estimates_within_bounds(spark, sf_dir):
    out = {r.o_orderstatus: r.approx_custs for r in agg_hll_sketch_merge(spark, sf_dir).collect()}
    o = load(spark, "orders", sf_dir)
    exact_per = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact_all = o.select("o_custkey").distinct().count()
    # default lgConfigK=12 -> relative standard error ~1.6%; allow 5%
    for status, exact in exact_per.items():
        assert abs(out[status] - exact) / exact < 0.05, (status, out[status], exact)
    assert abs(out["ALL"] - exact_all) / exact_all < 0.05, (out["ALL"], exact_all)
    # the merged estimate must reflect the union, not the sum of parts
    assert out["ALL"] < sum(v for k, v in out.items() if k != "ALL")


def test_cms_estimates_never_undercount(spark, sf_dir):
    """The count-min guarantee: every estimate >= the true count, and
    with 4x1024 cells on this key cardinality most top keys estimate
    exactly."""
    from api_weather_kafka_clickhouse_spark.operators.aggregations import (
        agg_heavy_hitters_cms,
    )

    rows = agg_heavy_hitters_cms(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.n_est >= r.n_true for r in rows)
    exact = sum(1 for r in rows if r.n_est == r.n_true)
    assert exact >= len(rows) // 2, (exact, len(rows))
