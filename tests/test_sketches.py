"""Sketch-operator guarantees: HLL estimates must sit within their
published error bounds of the exact answers, including after merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators.aggregations import (
    agg_hll_sketch_merge,
    hll_custs_estimates,
)


def test_hll_estimates_within_bounds(spark, sf_dir):
    rows = {r.o_orderstatus: r for r in hll_custs_estimates(spark, sf_dir).collect()}
    # default lgConfigK=12 -> relative standard error ~1.6%; allow 5%
    for status, r in rows.items():
        assert abs(r.approx_custs - r.exact_custs) / r.exact_custs < 0.05, (
            status,
            r.approx_custs,
            r.exact_custs,
        )
    # the merged estimate must reflect the union, not the sum of parts
    approx = {k: r.approx_custs for k, r in rows.items()}
    assert approx["ALL"] < sum(v for k, v in approx.items() if k != "ALL")
    # and the registered bounds query (the driver's hash surface)
    # reports every group inside its 3% gate
    flags = agg_hll_sketch_merge(spark, sf_dir).collect()
    assert flags and all(r.within_3pct for r in flags)


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


def test_cms_sketches_merge_exactly(spark, sf_dir):
    """Mergeability — the property that makes CMS the streaming /
    sharded path: sketch two disjoint halves independently, fold with
    cms_merge, and every counter equals the whole-corpus sketch."""
    from api_weather_kafka_clickhouse_spark.operators.aggregations import (
        cms_merge,
        cms_sketch,
    )
    from api_weather_kafka_clickhouse_spark.tables import load
    from pyspark.sql import functions as F

    e = load(spark, "events", sf_dir)
    half_a = e.filter(F.col("event_id") % 2 == 0)
    half_b = e.filter(F.col("event_id") % 2 == 1)
    merged = {
        (r.s, r.bucket): r.cnt
        for r in cms_merge(cms_sketch(half_a, "user_id"), cms_sketch(half_b, "user_id")).collect()
    }
    whole = {(r.s, r.bucket): r.cnt for r in cms_sketch(e, "user_id").collect()}
    assert merged == whole
