"""Incremental segment-level dedup ingestion: documents are rewritten
minus segments already seen by the persistent index (or earlier in
their own batch); first-seen segment hashes extend the index."""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark.streaming import segment_ingest

B = " ".join(f"b{i}" for i in range(5))  # a 5-token boilerplate block
T1 = "one unique tail here x"
T2 = "two other tail there y"
T3 = "third completely different tail z"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _out(spark, d):
    return {r.doc_id: r for r in spark.read.parquet(d).collect()}


def test_cross_batch_boilerplate_removed_once(spark, tmp_path):
    store = str(tmp_path / "segstore")
    out = str(tmp_path / "segout")
    segment_ingest.segment_ingest_batch(
        _mk(spark, [(1, B + " " + T1)]), 0, store, out, seg_tokens=5
    )
    segment_ingest.segment_ingest_batch(
        _mk(spark, [(2, B + " " + T2), (3, B + " " + T3)]), 1, store, out, seg_tokens=5
    )
    got = _out(spark, out)
    assert got[1].text_clean == B + " " + T1
    # batch 1: the boilerplate block was indexed by doc 1; doc 2 keeps
    # only its tail, and doc 3's copy of B (also seen earlier in its
    # OWN batch via doc 2? no — B was dropped from 2 as already
    # stored, but within-batch keep-first ran before the store
    # anti-join, so 2's copy claimed B in-batch and then lost it to
    # the store) is removed too
    assert got[2].text_clean == T2
    assert got[3].text_clean == T3
    assert (got[2].n_segs, got[2].n_kept) == (2, 1)


def test_within_batch_keep_first_and_full_dedup_doc(spark, tmp_path):
    store = str(tmp_path / "segstore2")
    out = str(tmp_path / "segout2")
    segment_ingest.segment_ingest_batch(
        _mk(spark, [(1, B + " " + T1), (2, B), (3, "a b c")]), 0, store, out, seg_tokens=5
    )
    got = _out(spark, out)
    assert got[1].text_clean == B + " " + T1  # lowest doc_id keeps B
    assert got[2].text_clean == "" and got[2].n_kept == 0  # fully removed
    assert got[3].text_clean == "a b c"  # partial segment survives


def test_replay_idempotent_and_empty_batch(spark, tmp_path):
    store = str(tmp_path / "segstore3")
    out = str(tmp_path / "segout3")
    b = _mk(spark, [(1, B + " " + T1), (2, B + " " + T2)])
    for _ in range(2):
        segment_ingest.segment_ingest_batch(b, 4, store, out, seg_tokens=5)
    got = _out(spark, out)
    assert len(got) == 2 and got[2].text_clean == T2
    # the index holds each first-seen hash exactly once
    hashes = [r.seg_hash for r in spark.read.parquet(store + "/segs").collect()]
    assert len(hashes) == len(set(hashes)) == 3  # B, T1, T2
    segment_ingest.segment_ingest_batch(_mk(spark, []), 5, store, out, seg_tokens=5)
    assert len(_out(spark, out)) == 2


def test_streaming_wiring_and_checkpoint_resume(spark, tmp_path):
    import json

    d = tmp_path / "segin"
    d.mkdir()
    store = str(tmp_path / "segstore4")
    out = str(tmp_path / "segout4")
    ckpt = str(tmp_path / "segckpt")

    def write(f, rows):
        (d / f).write_text(
            "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows)
        )

    write("b0.json", [(1, B + " " + T1)])
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    q = segment_ingest.start_segment_ingest(stream, store, out, ckpt, seg_tokens=5)
    q.awaitTermination()
    write("b1.json", [(2, B + " " + T2)])
    stream2 = spark.readStream.schema("doc_id long, text string").json(str(d))
    q2 = segment_ingest.start_segment_ingest(stream2, store, out, ckpt, seg_tokens=5)
    q2.awaitTermination()
    got = _out(spark, out)
    assert got[1].text_clean == B + " " + T1
    assert got[2].text_clean == T2
