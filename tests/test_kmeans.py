"""Distributed Lloyd k-means (operators/similarity.kmeans_fit_assign):
equivalence with a single-node numpy reference under the same
deterministic init, Lloyd's monotone-SSE property, and run-to-run
determinism. The registry entry is rows-only by design (iterative
float argmin has no SQL oracle); these tests are its correctness
contract."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators.similarity import (
    KMEANS_ITERS,
    KMEANS_K,
    kmeans_fit_assign,
)
from api_weather_kafka_clickhouse_spark.functions.vectors import to_double
from api_weather_kafka_clickhouse_spark.tables import load


def _numpy_lloyd(ids, m, k, iters):
    order = np.argsort(ids)
    centroids = m[order[:k]].copy()
    assign = None
    for _ in range(iters):
        d2 = (centroids * centroids).sum(axis=1)[None, :] - 2.0 * (m @ centroids.T)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                centroids[c] = m[mask].mean(axis=0)
    return assign, centroids, d2


def _load_np(spark, sf_dir):
    rows = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", to_double("embedding").alias("vec"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    m = np.stack([np.array(r["vec"]) for r in rows])
    return ids, m


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    ids, m = _load_np(spark, sf_dir)
    ref_assign, ref_cent, d2 = _numpy_lloyd(ids, m, KMEANS_K, KMEANS_ITERS)
    ref = dict(zip(ids.tolist(), ref_assign.tolist()))

    vecs = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", to_double("embedding").alias("vec"))
    )
    assigned, cent, sse = kmeans_fit_assign(vecs)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}

    # distributed avg vs numpy mean can differ in the last ulp, which
    # can only flip an assignment when two centroids are equidistant
    # to that precision — compare where the margin is clear
    d2s = np.sort(d2, axis=1)
    margin = dict(zip(ids.tolist(), (d2s[:, 1] - d2s[:, 0]).tolist()))
    mismatch = [i for i in got if got[i] != ref[i] and margin[i] > 1e-9]
    assert not mismatch, mismatch[:10]
    assert np.allclose(np.array(cent), ref_cent, atol=1e-9)


def test_kmeans_sse_monotone_nonincreasing(spark, sf_dir):
    vecs = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", to_double("embedding").alias("vec"))
    )
    _, _, sse = kmeans_fit_assign(vecs, iters=4)
    assert len(sse) == 4
    for a, b in zip(sse, sse[1:]):
        assert b <= a * (1 + 1e-12), sse


def test_kmeans_deterministic_and_total(spark, sf_dir):
    vecs = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", to_double("embedding").alias("vec"))
    )
    a1, _, _ = kmeans_fit_assign(vecs, iters=2)
    a2, _, _ = kmeans_fit_assign(vecs.repartition(7), iters=2)
    r1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    r2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert r1 == r2
    assert len(r1) == vecs.count()
    assert set(r1.values()) <= set(range(KMEANS_K))
    # k-means over 10-label synthetic data should use several clusters
    assert len(set(r1.values())) >= 3
