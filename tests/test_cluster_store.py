"""Persistent incremental cluster labels (streaming/cluster_store.py):
batch-by-batch merge of ingest pair logs into a stored labeling, with
crash-safe swaps and idempotent replay."""

from __future__ import annotations

import os
import pathlib
import shutil

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators import dedup
from api_weather_kafka_clickhouse_spark.streaming import cluster_store
import pytest

# minutes-scale streaming/crash-window suite -> slow lane; the fast
# per-commit gate is `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow


def _mk_pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


def _labels(spark, d):
    return {
        (r.doc_id, r.canonical_id)
        for r in cluster_store.read_labels(spark, d).collect()
    }


def test_update_canonicalize_and_incremental_merge(spark, tmp_path):
    d = str(tmp_path / "labels")
    cluster_store.update_labels(spark, d, _mk_pairs(spark, [(2, 1), (5, 4)]))
    assert _labels(spark, d) == {(1, 1), (2, 1), (4, 4), (5, 4)}

    docs = spark.createDataFrame([(i, f"t{i}") for i in (1, 2, 3, 5)], "doc_id bigint, text string")
    canon = {
        (r.doc_id, r.canonical_id)
        for r in cluster_store.canonicalize(docs, cluster_store.read_labels(spark, d)).collect()
    }
    assert canon == {(1, 1), (2, 1), (3, 3), (5, 4)}

    # a later batch bridges the two clusters through a new vertex
    cluster_store.update_labels(spark, d, _mk_pairs(spark, [(4, 9), (9, 2)]))
    assert _labels(spark, d) == {(1, 1), (2, 1), (4, 1), (5, 1), (9, 1)}


def test_update_is_idempotent_and_matches_full_recompute(spark, tmp_path):
    d = str(tmp_path / "labels")
    b1 = [(2, 1), (3, 2)]
    b2 = [(10, 11), (3, 10)]
    cluster_store.update_labels(spark, d, _mk_pairs(spark, b1))
    cluster_store.update_labels(spark, d, _mk_pairs(spark, b2))
    # replaying a batch (crash-after-swap rerun) changes nothing
    cluster_store.update_labels(spark, d, _mk_pairs(spark, b2))
    full = {
        (r.doc_id, r.canonical_id)
        for r in dedup.connected_components(_mk_pairs(spark, b1 + b2)).collect()
    }
    assert _labels(spark, d) == full


def test_swap_crash_recovery(spark, tmp_path):
    d = str(tmp_path / "labels")
    cluster_store.update_labels(spark, d, _mk_pairs(spark, [(2, 1)]))
    live = os.path.join(d, "labels")

    # marked tmp beside live = interrupted swap AFTER the new state
    # materialized: recovery must finish the swap (prefer tmp)
    tmp = live + "__swap_tmp"
    shutil.copytree(live, tmp)
    pathlib.Path(tmp, "_COMPACT_DONE").touch()
    newer = spark.createDataFrame([(7, 7), (8, 7)], "doc_id bigint, canonical_id bigint")
    newer.write.mode("overwrite").parquet(tmp)
    pathlib.Path(tmp, "_COMPACT_DONE").touch()
    assert _labels(spark, d) == {(7, 7), (8, 7)}
    assert not os.path.exists(tmp)

    # unmarked tmp = partial write: discarded, live intact
    shutil.copytree(live, tmp)
    (pathlib.Path(tmp) / "_COMPACT_DONE").unlink()
    assert _labels(spark, d) == {(7, 7), (8, 7)}
    assert not os.path.exists(tmp)


def test_ingest_pairs_feed_cluster_store(spark, tmp_path):
    """End-to-end: dedup_ingest pairs log -> per-batch label updates;
    canonicalize resolves survivors AND dropped ids."""
    from api_weather_kafka_clickhouse_spark.streaming import dedup_ingest
    from tests.test_dedup_ingest import BASE, DISTINCT, _mk

    store = str(tmp_path / "store")
    out = str(tmp_path / "surv")
    pairs = str(tmp_path / "pairs")
    labels_dir = str(tmp_path / "labels")

    for bid, rows in enumerate(
        [
            [(1, BASE), (2, DISTINCT)],
            [(3, BASE + " indeed"), (4, DISTINCT + " too")],
        ]
    ):
        dedup_ingest.dedup_ingest_batch(_mk(spark, rows), bid, store, out, pairs_dir=pairs)
        # read_store: a batch with zero drops writes an empty (or no)
        # partition — that is an empty pair set, not a read error
        from api_weather_kafka_clickhouse_spark.streaming.store import read_store

        batch_pairs = read_store(
            spark,
            pairs,
            "dropped_id bigint, kept_id bigint, kind string",
            only_batch=bid,
        ).select(F.col("dropped_id").alias("doc_a"), F.col("kept_id").alias("doc_b"))
        cluster_store.update_labels(spark, labels_dir, batch_pairs)

    assert _labels(spark, labels_dir) == {(1, 1), (3, 1), (2, 2), (4, 2)}
