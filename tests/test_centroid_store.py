"""Streaming mini-batch k-means (streaming/centroid_store.py):
first-batch equivalence with one Lloyd step, convergence toward
planted cluster structure across batches, replay idempotency of the
non-idempotent centroid update, crash recovery of the swap, and the
end-to-end Structured Streaming wiring with checkpoint resume."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.streaming import centroid_store as CS

# minutes-scale streaming/crash-window suite -> slow lane; the fast
# per-commit gate is `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow

DIM = 4


def _vecs_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, vec array<double>")


def _planted(rng, vec_id, center):
    return (vec_id, [float(c + rng.normal(0, 0.05)) for c in center])


CENTERS = [[5.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0], [0.0, 0.0, 5.0, 0.0]]


def _batch(spark, rng, start_id, n_per_center):
    # interleave centers so the deterministic lowest-id init picks one
    # seed per planted cluster (center-sorted ids would seed all k
    # centroids from the same cluster — a real k-means init failure,
    # not a store bug)
    rows = []
    i = start_id
    for _ in range(n_per_center):
        for c in CENTERS:
            rows.append(_planted(rng, i, c))
            i += 1
    return _vecs_df(spark, rows), i


def test_first_batch_is_one_lloyd_step(spark, tmp_path):
    from api_weather_kafka_clickhouse_spark.operators.similarity import kmeans_fit_assign

    rng = np.random.default_rng(7)
    batch, _ = _batch(spark, rng, 0, 5)
    store = str(tmp_path / "cs1")
    CS.centroid_ingest_batch(batch, 0, store, k=3, dim=DIM)
    cents, counts, applied = CS.read_centroid_state(spark, store)
    assert applied == 0
    assert sum(counts) == batch.count()
    _, lloyd_cents, _ = kmeans_fit_assign(batch, k=3, iters=1, dim=DIM)
    for a, b in zip(cents, lloyd_cents):
        assert np.allclose(a, b, atol=1e-9)


def test_converges_toward_planted_centers(spark, tmp_path):
    rng = np.random.default_rng(11)
    store = str(tmp_path / "cs2")
    next_id = 0
    for bid in range(4):
        batch, next_id = _batch(spark, rng, next_id, 8)
        CS.centroid_ingest_batch(batch, bid, store, k=3, dim=DIM)
    cents, counts, applied = CS.read_centroid_state(spark, store)
    assert applied == 3
    assert sum(counts) == next_id
    # every planted center is within noise distance of SOME centroid
    for c in CENTERS:
        d = min(np.linalg.norm(np.array(c) - np.array(cc)) for cc in cents)
        assert d < 0.5, (c, cents)


def test_replay_does_not_reapply_centroid_update(spark, tmp_path):
    rng = np.random.default_rng(13)
    store = str(tmp_path / "cs3")
    b0, next_id = _batch(spark, rng, 0, 5)
    b1, _ = _batch(spark, rng, next_id, 5)
    CS.centroid_ingest_batch(b0, 0, store, k=3, dim=DIM)
    CS.centroid_ingest_batch(b1, 1, store, k=3, dim=DIM)
    before = CS.read_centroid_state(spark, store)
    labels_before = {
        (r.vec_id, r.cluster)
        for r in spark.read.parquet(os.path.join(store, "assign")).collect()
    }
    CS.centroid_ingest_batch(b1, 1, store, k=3, dim=DIM)  # replay
    after = CS.read_centroid_state(spark, store)
    assert before[1] == after[1]  # counts unchanged
    assert before[2] == after[2] == 1
    for a, b in zip(before[0], after[0]):
        assert a == b
    # the replay is a complete no-op: the assignment partition is NOT
    # recomputed (doing so would use the post-update centroids and
    # relabel boundary vectors — the round-6 review finding)
    labels_after = {
        (r.vec_id, r.cluster)
        for r in spark.read.parquet(os.path.join(store, "assign")).collect()
    }
    assert labels_after == labels_before
    assert len(labels_after) == b0.count() + b1.count()


def test_swap_crash_recovery(spark, tmp_path):
    from api_weather_kafka_clickhouse_spark.streaming.store import COMPACT_MARKER

    rng = np.random.default_rng(17)
    store = str(tmp_path / "cs4")
    b0, _ = _batch(spark, rng, 0, 5)
    CS.centroid_ingest_batch(b0, 0, store, k=3, dim=DIM)
    good = CS.read_centroid_state(spark, store)
    path = CS._centroids_path(store)

    # crash AFTER tmp fully wrote (marker present), before swap: tmp
    # is the newer state and must win
    os.rename(path, path + "__swap_tmp")
    state = CS.read_centroid_state(spark, store)  # triggers _recover
    assert state is None or True  # recovery ran; now live again
    recovered = CS.read_centroid_state(spark, store)
    assert recovered is not None
    assert recovered[1] == good[1]

    # crash MID tmp write (no marker): remnant discarded, live intact
    import shutil

    shutil.copytree(path, path + "__swap_tmp")
    os.remove(os.path.join(path + "__swap_tmp", COMPACT_MARKER))
    again = CS.read_centroid_state(spark, store)
    assert again is not None and again[1] == good[1]
    assert not os.path.exists(path + "__swap_tmp")


def test_streaming_wiring_with_checkpoint_resume(spark, tmp_path):
    rng = np.random.default_rng(19)
    src = tmp_path / "cs_src"
    src.mkdir()
    store = str(tmp_path / "cs_store")
    ckpt = str(tmp_path / "cs_ckpt")

    def write_batch(name, start_id):
        rows, i = [], start_id
        for _ in range(4):
            for c in CENTERS:
                vid, v = _planted(rng, i, c)
                rows.append({"vec_id": vid, "vec": v})
                i += 1
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return i

    n1 = write_batch("b0.json", 0)
    stream = spark.readStream.schema("vec_id long, vec array<double>").json(str(src))
    q = CS.start_centroid_ingest(stream, store, ckpt, k=3, dim=DIM)
    q.awaitTermination(60)
    n2 = write_batch("b1.json", n1)
    q2 = CS.start_centroid_ingest(
        spark.readStream.schema("vec_id long, vec array<double>").json(str(src)),
        store,
        ckpt,
        k=3,
        dim=DIM,
    )
    q2.awaitTermination(60)
    cents, counts, _ = CS.read_centroid_state(spark, store)
    assert sum(counts) == n2
    assign = spark.read.parquet(os.path.join(store, "assign"))
    assert assign.count() == n2
    for c in CENTERS:
        d = min(np.linalg.norm(np.array(c) - np.array(cc)) for cc in cents)
        assert d < 0.6, (c, cents)
