"""The packaged streaming curation pipeline (streaming/curation.py):
the public entry point for the gopher -> bloom -> dedup -> label-store
chain the capstone test (test_dedup_ingest.test_full_curation_chain_
streaming) wires by hand. Verifies the same end-to-end semantics
through the deployable surface, plus checkpoint resume and backfill
equivalence via curate_batch."""

from __future__ import annotations

import json
import os

import pytest

from api_weather_kafka_clickhouse_spark.streaming import curation

# minutes-scale streaming/crash-window suite -> slow lane; the fast
# per-commit gate is `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow

CLEAN = " ".join(f"alpha{i % 7} beta gamma the of wordy" for i in range(10))
JUNK = " ".join("12345 67890" for _ in range(30))  # fails gopher
LEAKED = CLEAN + " held out eval sequence"  # fails decontam
OTHER = " ".join(f"omega{i % 5} psi chi the of texty" for i in range(10))


def _write_docs(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _eval_grams(spark):
    return spark.createDataFrame([("held out eval sequence",)], "gram string")


def _stream(spark, src):
    return spark.readStream.schema("doc_id long, text string").json(str(src))


def test_pipeline_end_to_end(spark, tmp_path):
    src = tmp_path / "cur_in"
    src.mkdir()
    base = str(tmp_path / "cur_base")

    _write_docs(src / "b0.json", [(1, CLEAN), (2, JUNK), (3, LEAKED)])
    q = curation.start_curation_pipeline(_stream(spark, src), base, eval_grams=_eval_grams(spark))
    q.awaitTermination(120)

    # junk and leaked never reached the index or the survivors
    assert {r.doc_id for r in curation.read_survivors(spark, base).collect()} == {1}

    # next increment: a near-dup of doc 1 plus a genuinely new doc —
    # availableNow terminated, start again on the same checkpoint
    _write_docs(src / "b1.json", [(4, CLEAN + " indeed"), (5, OTHER)])
    q2 = curation.start_curation_pipeline(
        _stream(spark, src), base, eval_grams=_eval_grams(spark)
    )
    q2.awaitTermination(120)

    assert {r.doc_id for r in curation.read_survivors(spark, base).collect()} == {1, 5}

    # the label store resolves the dropped near-dup to its canonical
    resolved = curation.resolve_canonical(
        spark, base, spark.createDataFrame([(1,), (4,), (5,)], "doc_id bigint")
    )
    canon = {r.doc_id: r.canonical_id for r in resolved.collect()}
    assert canon == {1: 1, 4: 1, 5: 5}


def test_backfill_batch_matches_stream(spark, tmp_path):
    """curate_batch is the same code path the stream runs — a batch
    backfill over the same docs produces the same survivors/labels."""
    from api_weather_kafka_clickhouse_spark.operators.bloom import build_bloom_bits

    base = str(tmp_path / "cur_bf")
    dirs = curation.curation_dirs(base)
    bits = build_bloom_bits(_eval_grams(spark))

    b0 = spark.createDataFrame(
        [(1, CLEAN), (2, JUNK), (3, LEAKED)], "doc_id bigint, text string"
    )
    b1 = spark.createDataFrame(
        [(4, CLEAN + " indeed"), (5, OTHER)], "doc_id bigint, text string"
    )
    curation.curate_batch(b0, 0, dirs, bits)
    curation.curate_batch(b1, 1, dirs, bits)

    assert {r.doc_id for r in curation.read_survivors(spark, base).collect()} == {1, 5}
    resolved = curation.resolve_canonical(
        spark, base, spark.createDataFrame([(4,)], "doc_id bigint")
    )
    assert resolved.collect()[0].canonical_id == 1


def test_eval_grams_and_bits_mutually_exclusive(spark, tmp_path):
    with pytest.raises(ValueError, match="not both"):
        curation.start_curation_pipeline(
            _stream(spark, tmp_path),
            str(tmp_path / "x"),
            eval_grams=_eval_grams(spark),
            bloom_bits=b"\x00" * 4,
        )


def test_no_decontam_when_neither_given(spark, tmp_path):
    """Without an eval suite the pipeline still gates quality and
    dedups — the leaked doc (which passes gopher) is then admitted."""
    base = str(tmp_path / "cur_nobloom")
    dirs = curation.curation_dirs(base)
    b0 = spark.createDataFrame(
        [(1, CLEAN), (2, JUNK), (3, LEAKED)], "doc_id bigint, text string"
    )
    curation.curate_batch(b0, 0, dirs, bloom_bits=None)
    survivors = {r.doc_id for r in curation.read_survivors(spark, base).collect()}
    assert 2 not in survivors  # junk still gated
    assert 1 in survivors
    # LEAKED is a near-dup of CLEAN (it is CLEAN + a 4-word suffix), so
    # either doc 3 was admitted or it was dropped as 1's near-dup with
    # provenance — but never silently lost
    if 3 not in survivors:
        resolved = curation.resolve_canonical(
            spark, base, spark.createDataFrame([(3,)], "doc_id bigint")
        )
        assert resolved.collect()[0].canonical_id == 1


def test_curate_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch retry semantics: re-running a batch id must leave
    survivors AND the label store unchanged (dedup partitions
    overwrite themselves; merge_components of already-folded pairs is
    a no-op) — the crash window between the dedup write and the label
    swap heals on replay."""
    from api_weather_kafka_clickhouse_spark.operators.bloom import build_bloom_bits
    from api_weather_kafka_clickhouse_spark.streaming.cluster_store import read_labels

    base = str(tmp_path / "cur_replay")
    dirs = curation.curation_dirs(base)
    bits = build_bloom_bits(_eval_grams(spark))
    b0 = spark.createDataFrame([(1, CLEAN), (2, JUNK)], "doc_id bigint, text string")
    b1 = spark.createDataFrame(
        [(4, CLEAN + " indeed"), (5, OTHER)], "doc_id bigint, text string"
    )
    curation.curate_batch(b0, 0, dirs, bits)
    curation.curate_batch(b1, 1, dirs, bits)
    surv_before = {r.doc_id for r in curation.read_survivors(spark, base).collect()}
    labels_before = {
        (r.doc_id, r.canonical_id) for r in read_labels(spark, dirs["labels"]).collect()
    }
    curation.curate_batch(b1, 1, dirs, bits)  # replay
    surv_after = {r.doc_id for r in curation.read_survivors(spark, base).collect()}
    labels_after = {
        (r.doc_id, r.canonical_id) for r in read_labels(spark, dirs["labels"]).collect()
    }
    assert surv_after == surv_before == {1, 5}
    assert labels_after == labels_before
    assert (4, 1) in labels_after


def test_crash_between_dedup_and_label_fold_heals_on_replay(spark, tmp_path):
    """The curate_batch crash window: the dedup stage committed its
    partitions (store/survivors/pairs) but the process died BEFORE
    the label fold. The foreachBatch replay re-runs the whole batch —
    dedup rewrites identical partitions, the pairs re-read, and the
    fold lands — so the label store converges to the same state as a
    crash-free run."""
    from api_weather_kafka_clickhouse_spark.operators.bloom import build_bloom_bits
    from api_weather_kafka_clickhouse_spark.streaming import dedup_ingest
    from api_weather_kafka_clickhouse_spark.streaming.cluster_store import read_labels

    bits = build_bloom_bits(_eval_grams(spark))
    b0 = spark.createDataFrame([(1, CLEAN)], "doc_id bigint, text string")
    b1 = spark.createDataFrame(
        [(4, CLEAN + " indeed"), (5, OTHER)], "doc_id bigint, text string"
    )

    # crash-free reference run
    ref = curation.curation_dirs(str(tmp_path / "ref"))
    curation.curate_batch(b0, 0, ref, bits)
    curation.curate_batch(b1, 1, ref, bits)
    want = {(r.doc_id, r.canonical_id) for r in read_labels(spark, ref["labels"]).collect()}

    # crashed run: batch 1's dedup stage committed, fold never ran
    crash = curation.curation_dirs(str(tmp_path / "crash"))
    curation.curate_batch(b0, 0, crash, bits)
    from api_weather_kafka_clickhouse_spark.operators.corpus_quality import gopher_filter
    from api_weather_kafka_clickhouse_spark.operators.bloom import decontam_filter

    dedup_ingest.dedup_ingest_batch(
        decontam_filter(gopher_filter(b1), bits), 1, crash["store"], crash["survivors"],
        pairs_dir=crash["pairs"],
    )
    assert {(r.doc_id, r.canonical_id) for r in read_labels(spark, crash["labels"]).collect()} != want

    curation.curate_batch(b1, 1, crash, bits)  # the foreachBatch replay
    got = {(r.doc_id, r.canonical_id) for r in read_labels(spark, crash["labels"]).collect()}
    surv = {r.doc_id for r in curation.read_survivors(spark, str(tmp_path / "crash")).collect()}
    assert got == want and (4, 1) in got
    assert surv == {1, 5}
