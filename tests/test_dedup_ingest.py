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


def test_short_docs_dedup_exactly_and_empty_batch_is_safe(spark, tmp_path):
    """Docs too short to shingle (< 3 tokens) carry no MinHash
    signature — they dedup EXACTLY via the shorts md5 store, across
    batches and within a batch; an empty batch must be a no-op, not a
    crash. Duplicate doc_ids in one batch collapse to one row."""
    store = str(tmp_path / "store_s")
    out = str(tmp_path / "survivors_s")

    b0 = spark.createDataFrame(
        [(1, "hello world"), (2, BASE)], "doc_id long, text string"
    )
    dedup_ingest.dedup_ingest_batch(b0, 0, store, out)

    # empty batch between real ones (post-restart no-data batch)
    empty = spark.createDataFrame([], "doc_id long, text string")
    dedup_ingest.dedup_ingest_batch(empty, 1, store, out)

    b2 = spark.createDataFrame(
        [
            (3, "hello world"),   # exact short dup of stored doc 1 -> dropped
            (4, "tiny doc"),      # new short -> admitted
            (5, "tiny doc"),      # same digest, larger id -> dropped in batch
            (6, DISTINCT),
            (6, DISTINCT),        # duplicate doc_id row -> collapses
        ],
        "doc_id long, text string",
    )
    dedup_ingest.dedup_ingest_batch(b2, 2, store, out)

    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 2, 4, 6}
    assert len(rows) == 4, "duplicate doc_id rows must collapse to one"
    shorts = spark.read.parquet(store + "/shorts")
    assert {r.doc_id for r in shorts.collect()} == {1, 4}
    # re-delivery of an already-admitted short doc in a later batch
    b3 = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    dedup_ingest.dedup_ingest_batch(b3, 3, store, out)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2, 4, 6}


def test_compact_store_folds_partitions_and_dedup_still_works(spark, tmp_path):
    import os as _os

    store = str(tmp_path / "store_c")
    out = str(tmp_path / "survivors_c")
    dedup_ingest.dedup_ingest_batch(
        spark.createDataFrame([(1, BASE)], "doc_id long, text string"), 0, store, out
    )
    dedup_ingest.dedup_ingest_batch(
        spark.createDataFrame([(2, DISTINCT), (3, "hi there")], "doc_id long, text string"),
        1, store, out,
    )
    assert dedup_ingest.compact_store(spark, store) == 3
    for sub in ("sigs", "bands", "shorts"):
        parts = [d for d in _os.listdir(_os.path.join(store, sub)) if d.startswith("ingest_batch=")]
        assert parts == ["ingest_batch=-1"], (sub, parts)
    # dedup against the compacted store still works...
    dedup_ingest.dedup_ingest_batch(
        spark.createDataFrame(
            [(4, BASE + " indeed"), (5, "hi there"), (6, DISTINCT2)],
            "doc_id long, text string",
        ),
        2, store, out,
    )
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2, 3, 6}
    # ...and a replay of a PRE-compaction batch is a safe no-op: its
    # docs self-match the compacted copies, nothing is re-admitted,
    # nothing already admitted is lost
    dedup_ingest.dedup_ingest_batch(
        spark.createDataFrame([(2, DISTINCT), (3, "hi there")], "doc_id long, text string"),
        1, store, out,
    )
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2, 3, 6}
    assert {r.doc_id for r in spark.read.parquet(store + "/sigs").collect()} == {1, 2, 6}
