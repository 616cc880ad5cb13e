"""Incremental streaming dedup ingestion: new docs are admitted only
if no near-dup exists in the persistent signature store or earlier in
their own batch; admitted docs extend the store."""

from __future__ import annotations

import json

from api_weather_kafka_clickhouse_spark.streaming import dedup_ingest

BASE = (
    "the quick brown fox jumps over the lazy dog while the query engine "
    "scans parquet row groups and prunes partitions by month before the "
    "broadcast join attaches the nation dimension to every fact row"
)
DISTINCT = (
    "completely different content about minhash signatures band keys and "
    "watermark bounded stateful streaming operators with arrow batches "
    "feeding the vectorized reader across shuffle boundaries at scale"
)
DISTINCT2 = (
    "yet another unrelated document where sequence packing fills fixed "
    "length windows with tokenized fragments and the shard assignment "
    "shuffles deterministically under a seeded permutation for training"
)


def _write_docs(path, rows):
    path.write_text("\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows))


def test_incremental_dedup_across_and_within_batches(spark, tmp_path):
    d = tmp_path / "ingest_in"
    d.mkdir()
    store = str(tmp_path / "store")
    out = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: one doc
    _write_docs(d / "b0.json", [(1, BASE)])
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: dedup_ingest.dedup_ingest_batch(df, bid, store, out)
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()

    # batch 2: near-dup of stored doc 1 (appended word), a distinct
    # doc, and a within-batch near-dup pair (3 kept, 4 dropped)
    _write_docs(
        d / "b1.json",
        [
            (2, BASE + " indeed"),
            (3, DISTINCT),
            (4, DISTINCT + " also"),
            (5, DISTINCT2),
        ],
    )
    q.processAllAvailable()
    q.stop()

    survivors = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert survivors == {1, 3, 5}, survivors

    # the store indexes exactly the survivors
    sigs = spark.read.parquet(store + "/sigs")
    assert {r.doc_id for r in sigs.collect()} == {1, 3, 5}
    bands = spark.read.parquet(store + "/bands")
    assert bands.count() == 3 * 16  # 16 bands per admitted doc


def test_dedup_ingest_batch_is_replay_idempotent(spark, tmp_path):
    """Re-running the same batch id (crash-between-sink-and-commit
    replay) overwrites its own partitions instead of double-admitting."""
    store = str(tmp_path / "store_r")
    out = str(tmp_path / "survivors_r")
    batch = spark.createDataFrame([(1, BASE), (2, DISTINCT)], "doc_id long, text string")
    for _ in range(2):
        dedup_ingest.dedup_ingest_batch(batch, 7, store, out)
    assert spark.read.parquet(out).count() == 2
    assert spark.read.parquet(store + "/sigs").count() == 2
    assert spark.read.parquet(store + "/bands").count() == 2 * 16


def test_dedup_ingest_replay_after_partial_store_write(spark, tmp_path):
    """Crash-window replay: first attempt wrote survivors and sigs but
    died before the bands write; the replayed batch must not
    self-match its own partial store entries — it recomputes the same
    admission and completes the index."""
    import shutil
    import os as _os

    store = str(tmp_path / "store_p")
    out = str(tmp_path / "survivors_p")
    batch = spark.createDataFrame([(1, BASE), (2, DISTINCT)], "doc_id long, text string")
    dedup_ingest.dedup_ingest_batch(batch, 3, store, out)
    # simulate the crash: bands partition of batch 3 vanishes
    shutil.rmtree(_os.path.join(store, "bands", "ingest_batch=3"))
    dedup_ingest.dedup_ingest_batch(batch, 3, store, out)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}
    assert spark.read.parquet(store + "/sigs").count() == 2
    assert spark.read.parquet(store + "/bands").count() == 2 * 16
