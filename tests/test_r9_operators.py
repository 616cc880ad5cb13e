"""Round-9 operators: the geo grid-join family is pinned against a
brute-force all-pairs recomputation in Spark itself (the oracle-parity
replica already pins it against DuckDB), plus plan-shape and
exactness invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.operators.geo import (
    RADIUS2,
    _points,
    _with_cell,
)

SPECS = registry.all_specs()


# ------------------------------------------------------- geo family


def _brute_pairs(spark, sf_dir):
    """All-pairs radius join, no grid: the semantic ground truth."""
    a = _points(spark, sf_dir)
    b = (
        a.select(
            F.col("point_id").alias("point_b"),
            F.col("lat_off").alias("lat_b"),
            F.col("lon_off").alias("lon_b"),
        )
    )
    d2 = (F.col("lat_off") - F.col("lat_b")) * (F.col("lat_off") - F.col("lat_b")) + (
        F.col("lon_off") - F.col("lon_b")
    ) * (F.col("lon_off") - F.col("lon_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("point_id") < F.col("point_b"))
        .select(
            F.col("point_id").alias("point_a"),
            "point_b",
            d2.cast("bigint").alias("dist2"),
        )
        .filter(F.col("dist2") <= RADIUS2)
    )


def test_grid_radius_join_equals_brute_force(spark, sf_dir):
    grid = {tuple(r) for r in SPECS["geo_radius_join"].fn(spark, sf_dir).collect()}
    brute = {tuple(r) for r in _brute_pairs(spark, sf_dir).collect()}
    assert grid == brute and len(grid) > 0


def test_knn_is_argmin_of_radius_candidates(spark, sf_dir):
    knn = {
        r["point_id"]: (r["dist2"], r["nn_id"])
        for r in SPECS["geo_knn_grid"].fn(spark, sf_dir).collect()
    }
    # ground truth: argmin over the symmetrized brute-force pair set,
    # with the operator's (dist2, nn_id) tiebreak
    best: dict[int, tuple[int, int]] = {}
    for r in _brute_pairs(spark, sf_dir).collect():
        for me, other in ((r["point_a"], r["point_b"]), (r["point_b"], r["point_a"])):
            cand = (r["dist2"], other)
            if me not in best or cand < best[me]:
                best[me] = cand
    assert knn == best and len(knn) > 0
    assert all(d2 <= RADIUS2 for d2, _ in knn.values())


def test_radius_join_plan_is_grid_equi_join_not_cartesian(spark, sf_dir):
    plan = (
        SPECS["geo_radius_join"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cell_density_counts_sum_to_population(spark, sf_dir):
    out = SPECS["geo_cell_density"].fn(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    n_pts = _points(spark, sf_dir).count()
    # top-20 cells can't exceed the population; every centroid must
    # fall inside its own cell's degree bounds
    assert sum(r["n_points"] for r in rows) <= n_pts
    for r in rows:
        assert r["cell_x"] * 10 - 180 <= r["centroid_lon"] < (r["cell_x"] + 1) * 10 - 180
        assert r["cell_y"] * 10 - 90 <= r["centroid_lat"] < (r["cell_y"] + 1) * 10 - 90


def test_points_derivation_is_stable_and_in_range(spark, sf_dir):
    pts = _with_cell(_points(spark, sf_dir), 50_000).collect()
    assert len(pts) > 0
    for r in pts:
        assert 0 <= r["lat_off"] < 1_800_000
        assert 0 <= r["lon_off"] < 3_600_000
        assert r["cell_x"] == r["lon_off"] // 50_000
        assert r["cell_y"] == r["lat_off"] // 50_000
