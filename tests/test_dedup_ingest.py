"""Incremental streaming dedup ingestion: new docs are admitted only
if no near-dup exists in the persistent signature store or earlier in
their own batch; admitted docs extend the store."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.streaming import dedup_ingest

# minutes-scale streaming/crash-window suite -> slow lane; the fast
# per-commit gate is `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow

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


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _seed_store(spark, tmp_path, tag):
    store = str(tmp_path / f"store_{tag}")
    out = str(tmp_path / f"surv_{tag}")
    dedup_ingest.dedup_ingest_batch(_mk(spark, [(1, BASE)]), 0, store, out)
    dedup_ingest.dedup_ingest_batch(
        _mk(spark, [(2, DISTINCT), (3, "hi there")]), 1, store, out
    )
    return store, out


def _assert_store_intact(spark, store, out, batch_id=9):
    """The recovered store must still drop a near-dup of stored doc 1
    AND an exact short dup of stored doc 3 — the silent-empty-store
    failure mode (round-5 compact_store crash window) admits both —
    while a genuinely-new doc is still admitted; and no swap debris
    (__compact_tmp / __compact_old) may remain."""
    import os as _os

    dedup_ingest.dedup_ingest_batch(
        _mk(spark, [(8, BASE + " indeed"), (9, "hi there"), (10, DISTINCT2)]),
        batch_id, store, out,
    )
    ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 8 not in ids and 9 not in ids, (
        f"recovered store failed to dedup — it is empty or partial: {ids}"
    )
    assert 10 in ids, f"recovered store must still admit new docs: {ids}"
    for sub in ("sigs", "bands", "shorts"):
        for suffix in ("__compact_tmp", "__compact_old"):
            assert not _os.path.exists(_os.path.join(store, sub) + suffix), (
                f"swap debris left behind: {sub}{suffix}"
            )


def test_compact_store_recovers_from_tmp_only_crash(spark, tmp_path):
    """The round-5 catastrophic window: a crash between delete-old and
    rename-in left each table ONLY in __compact_tmp. A rerun must
    recover the table before deciding anything — the old code's
    existence check skipped it, and every later batch then read an
    empty store and silently re-admitted near-dups of all history."""
    import os as _os
    import shutil

    store, out = _seed_store(spark, tmp_path, "tmponly")
    assert dedup_ingest.compact_store(spark, store) == 3
    for sub in ("sigs", "bands", "shorts"):
        p = _os.path.join(store, sub)
        shutil.move(p, p + "__compact_tmp")
    assert dedup_ingest.compact_store(spark, store) == 3
    _assert_store_intact(spark, store, out)


def test_compact_store_recovers_mid_swap_crash(spark, tmp_path):
    """Crash between rename-aside and rename-tmp-in: the live path is
    missing, tmp holds the complete compacted copy (with its
    _COMPACT_DONE marker — the new writer creates it right after the
    tmp parquet job), aside holds the pre-compaction history.
    Recovery must prefer the marker-trusted tmp and clear aside."""
    import os as _os
    import pathlib
    import shutil

    store, out = _seed_store(spark, tmp_path, "midswap")
    for sub in ("sigs", "bands", "shorts"):
        p = _os.path.join(store, sub)
        shutil.copytree(p, p + "__compact_tmp")
        pathlib.Path(p + "__compact_tmp", "_COMPACT_DONE").touch()
        shutil.move(p, p + "__compact_old")
    assert dedup_ingest.compact_store(spark, store) == 3
    _assert_store_intact(spark, store, out)


def test_compact_store_recovers_unmarked_mid_swap_crash(spark, tmp_path):
    """Same window but tmp carries NO marker (legacy pre-marker
    writer, or a partial tmp write): recovery must fall back to the
    complete aside copy instead of trusting tmp."""
    import os as _os
    import shutil

    store, out = _seed_store(spark, tmp_path, "midswapleg")
    for sub in ("sigs", "bands", "shorts"):
        p = _os.path.join(store, sub)
        shutil.copytree(p, p + "__compact_tmp")
        shutil.move(p, p + "__compact_old")
    assert dedup_ingest.compact_store(spark, store) == 3
    _assert_store_intact(spark, store, out)


def test_compact_store_prefers_marked_tmp_over_partial_live_and_aside(spark, tmp_path):
    """The non-atomic-rename (object store) mid-step-3 state: live AND
    aside both exist as PARTIAL remnants while tmp holds the one
    complete, marker-trusted copy. The round-5 recovery deleted aside
    and kept the partial live — silently truncating the index;
    recovery must instead install tmp."""
    import os as _os
    import pathlib
    import shutil

    store, out = _seed_store(spark, tmp_path, "s3amid")
    for sub in ("sigs", "bands", "shorts"):
        p = _os.path.join(store, sub)
        shutil.copytree(p, p + "__compact_tmp")
        pathlib.Path(p + "__compact_tmp", "_COMPACT_DONE").touch()
        # partial aside: the copy started; partial live: files deleted
        _os.makedirs(p + "__compact_old")
        for f in list(pathlib.Path(p).rglob("*.parquet")):
            f.unlink()
    assert dedup_ingest.compact_store(spark, store) == 3
    _assert_store_intact(spark, store, out)


def test_compact_store_recovers_aside_leftover_crash(spark, tmp_path):
    """Crash after rename-tmp-in but before delete-aside: the live
    table is complete; the stale aside copy must be cleared and
    compaction proceed normally."""
    import os as _os
    import shutil

    store, out = _seed_store(spark, tmp_path, "aside")
    for sub in ("sigs", "bands", "shorts"):
        p = _os.path.join(store, sub)
        shutil.copytree(p, p + "__compact_old")
    assert dedup_ingest.compact_store(spark, store) == 3
    _assert_store_intact(spark, store, out)


def test_streaming_signatures_are_batch_independent(spark, tmp_path):
    """Round-5 review: the per-batch SHINGLE_DF_CAP made stored
    signatures depend on batch COMPOSITION — a boilerplate shingle
    crossing the cap in a big backfill batch (dropped before signing)
    but not in a small later batch gave identical text different
    signatures, so near-dups against the store were missed below the
    similarity estimate. The streaming path must sign context-free
    (cap=None): (a) the stored signature of a text is identical
    whether it arrived alone or in a >cap-skewed batch, and (b) a
    near-dup split across such batches is still dropped."""
    from api_weather_kafka_clickhouse_spark.operators.dedup import SHINGLE_DF_CAP

    boiler = " ".join(f"boiler{i}" for i in range(30))
    t1 = boiler + " alpha beta gamma"
    n_fillers = SHINGLE_DF_CAP + 10  # boiler shingles cross the DF cap
    big = [(1, t1)] + [
        (i, f"{boiler} unique filler token {i}") for i in range(2, n_fillers + 2)
    ]

    store_a, out_a = str(tmp_path / "store_big"), str(tmp_path / "surv_big")
    dedup_ingest.dedup_ingest_batch(_mk(spark, big), 0, store_a, out_a)
    store_b, out_b = str(tmp_path / "store_solo"), str(tmp_path / "surv_solo")
    dedup_ingest.dedup_ingest_batch(_mk(spark, [(1, t1)]), 0, store_b, out_b)

    sig_a = spark.read.parquet(store_a + "/sigs").filter("doc_id = 1").collect()
    sig_b = spark.read.parquet(store_b + "/sigs").filter("doc_id = 1").collect()
    assert len(sig_a) == 1 and len(sig_b) == 1
    assert list(sig_a[0].sig) == list(sig_b[0].sig), (
        "stored signature of identical text must not depend on what "
        "else arrived in its batch"
    )

    # the near-dup pair split across the skewed backfill batch and a
    # later small batch: capped signing misses it, context-free drops it
    dedup_ingest.dedup_ingest_batch(_mk(spark, [(5000, t1 + " indeed")]), 1, store_a, out_a)
    ids = {r.doc_id for r in spark.read.parquet(out_a).collect()}
    assert 5000 not in ids, "near-dup of a backfill-batch doc must be dropped"


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


def test_store_scheme_mismatch_fails_loud(spark, tmp_path):
    """A store written under different signing parameters must refuse
    to open: similarity estimates between artifacts of two schemes are
    biased low, so near-dups across the boundary would be silently
    re-admitted (the round-6 capped->uncapped boundary case)."""
    import os as _os

    import pytest

    store = str(tmp_path / "store")
    out = str(tmp_path / "survivors")
    docs = spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
    dedup_ingest.dedup_ingest_batch(docs, 0, store, out)
    # the store records the current scheme... (read via the library's
    # canonical reader: round-15 writes the marker as a plain
    # driver-side file, which spark.read.text's underscore-prefix
    # listing filter would ignore)
    from api_weather_kafka_clickhouse_spark.streaming.store import read_small_text

    scheme_dir = _os.path.join(store, "_scheme")
    got = (read_small_text(spark, scheme_dir) or "").strip()
    assert got == dedup_ingest.SIG_SCHEME
    # ...and the old directory-style record (written below by
    # spark.write.text, the pre-round-15 layout) stays readable
    # ...and a code change to the scheme string refuses the old store
    (
        spark.createDataFrame([("minhash64-bands16x4-shingle3-CAPPED",)], "value string")
        .coalesce(1)
        .write.mode("overwrite")
        .text(scheme_dir)
    )
    with pytest.raises(RuntimeError, match="scheme"):
        dedup_ingest.dedup_ingest_batch(docs, 1, store, out)


def test_preversioning_store_with_data_fails_loud(spark, tmp_path):
    """A store holding table data but no _scheme record (written
    before versioning existed) cannot be assumed compatible — opening
    it must raise, not silently miss near-dups."""
    import os as _os

    import pytest

    store = str(tmp_path / "store")
    _os.makedirs(_os.path.join(store, "sigs"))
    docs = spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
    with pytest.raises(RuntimeError, match="scheme"):
        dedup_ingest.dedup_ingest_batch(docs, 0, store, out := str(tmp_path / "sv"))


def test_pairs_log_records_provenance_and_feeds_merge_components(spark, tmp_path):
    """pairs_dir logs one (dropped_id, kept_id, kind) row per dedup
    decision, replay-idempotently; merge_components over the logged
    pairs reconstructs the cluster structure incrementally."""
    from api_weather_kafka_clickhouse_spark.operators import dedup as dedup_ops

    store = str(tmp_path / "store")
    out = str(tmp_path / "surv")
    pairs = str(tmp_path / "pairs")

    b0 = _mk(spark, [(1, BASE), (3, "hi there")])
    dedup_ingest.dedup_ingest_batch(b0, 0, store, out, pairs_dir=pairs)
    b1 = _mk(
        spark,
        [
            (2, BASE + " indeed"),      # near-dup of stored 1
            (4, DISTINCT),              # admitted
            (5, DISTINCT + " also"),    # near-dup of 4 within batch
            (6, "hi there"),            # exact short dup of stored 3
            (7, "tiny doc"),            # admitted short
            (8, "tiny doc"),            # short dup of 7 within batch
        ],
    )
    dedup_ingest.dedup_ingest_batch(b1, 1, store, out, pairs_dir=pairs)

    def read_pairs():
        return {
            (r.dropped_id, r.kept_id, r.kind)
            for r in spark.read.parquet(pairs).collect()
        }

    expected = {
        (2, 1, "neardup_store"),
        (5, 4, "neardup_batch"),
        (6, 3, "short_store"),
        (8, 7, "short_batch"),
    }
    assert read_pairs() == expected

    # replaying batch 1 overwrites its pairs partition with the same rows
    dedup_ingest.dedup_ingest_batch(b1, 1, store, out, pairs_dir=pairs)
    assert read_pairs() == expected

    # incremental clustering over the logged pairs: start from an
    # empty labeling, fold the pair log in
    empty = spark.createDataFrame([], "doc_id bigint, canonical_id bigint")
    edge_df = spark.read.parquet(pairs).select(
        F.col("dropped_id").alias("doc_a"), F.col("kept_id").alias("doc_b")
    )
    labels = {
        (r.doc_id, r.canonical_id)
        for r in dedup_ops.merge_components(empty, edge_df).collect()
    }
    assert labels == {(1, 1), (2, 1), (4, 4), (5, 4), (3, 3), (6, 3), (7, 7), (8, 7)}


def test_quality_gate_composes_with_streaming_ingest(spark, tmp_path):
    """gopher_keep is pure codegen, so the quality gate is a plain
    .filter on the STREAMING frame in front of the dedup index: junk
    never reaches the store, near-dups among quality docs still drop."""
    from api_weather_kafka_clickhouse_spark.operators.corpus_quality import gopher_filter

    good = " ".join(f"alpha{i % 7} beta gamma the of wordy" for i in range(10))  # 60 tokens
    junk = " ".join("12345 67890" for _ in range(30))  # fails alpha ratio
    d = tmp_path / "qg_in"
    d.mkdir()
    store = str(tmp_path / "qg_store")
    out = str(tmp_path / "qg_out")
    ckpt = str(tmp_path / "qg_ckpt")

    _write_docs(d / "b0.json", [(1, good), (2, junk)])
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    q = (
        gopher_filter(stream)
        .writeStream.foreachBatch(
            lambda df, bid: dedup_ingest.dedup_ingest_batch(df, bid, store, out)
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # near-dup of the good doc AND more junk in a later batch
    _write_docs(d / "b1.json", [(3, good + " indeed"), (4, junk + " 000")])
    q.processAllAvailable()
    q.stop()

    survivors = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert survivors == {1}, survivors
    sigs = spark.read.parquet(store + "/sigs")
    assert {r.doc_id for r in sigs.collect()} == {1}


def test_decontam_gate_composes_with_streaming_ingest(spark, tmp_path):
    """decontam_keep is pure codegen too, so the full curation chain
    quality -> decontamination -> dedup runs as plain filters in front
    of the streaming index: a doc sharing a 4-gram with the eval suite
    never reaches the store; clean near-dups still drop."""
    from api_weather_kafka_clickhouse_spark.operators.bloom import (
        build_bloom_bits,
        decontam_filter,
    )

    eval_grams = spark.createDataFrame([("secret eval question four",)], "gram string")
    bits = build_bloom_bits(eval_grams)

    clean = " ".join(f"alpha{i % 7} beta gamma the of wordy" for i in range(10))
    leaked = clean + " secret eval question four"
    d = tmp_path / "dc_in"
    d.mkdir()
    store = str(tmp_path / "dc_store")
    out = str(tmp_path / "dc_out")
    ckpt = str(tmp_path / "dc_ckpt")

    _write_docs(d / "b0.json", [(1, clean), (2, leaked)])
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    q = (
        decontam_filter(stream, bits)
        .writeStream.foreachBatch(
            lambda df, bid: dedup_ingest.dedup_ingest_batch(df, bid, store, out)
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # later batch: a near-dup of the clean doc and another leaked doc
    _write_docs(d / "b1.json", [(3, clean + " indeed"), (4, "x y " + leaked)])
    q.processAllAvailable()
    q.stop()

    survivors = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert survivors == {1}, survivors
    sigs = spark.read.parquet(store + "/sigs")
    assert {r.doc_id for r in sigs.collect()} == {1}


def test_full_curation_chain_streaming(spark, tmp_path):
    """Capstone composition: quality gate -> decontamination gate ->
    incremental near-dup dedup -> cluster-label store, all on ONE
    streaming frame. Junk and leaked docs never reach the index,
    near-dups among surviving docs drop with provenance pairs, and
    the label store resolves every dropped doc to its kept canonical.

    The PACKAGED version of this exact chain is
    streaming/curation.py::start_curation_pipeline (the entry point a
    user deploys; tests/test_curation.py drives it end to end) — this
    test keeps the hand-wired composition as the reference semantics."""
    from api_weather_kafka_clickhouse_spark.operators.bloom import (
        build_bloom_bits,
        decontam_filter,
    )
    from api_weather_kafka_clickhouse_spark.operators.corpus_quality import gopher_filter
    from api_weather_kafka_clickhouse_spark.streaming import cluster_store
    from pyspark.sql import functions as F

    eval_grams = spark.createDataFrame([("held out eval sequence",)], "gram string")
    bits = build_bloom_bits(eval_grams)

    clean = " ".join(f"alpha{i % 7} beta gamma the of wordy" for i in range(10))
    junk = " ".join("12345 67890" for _ in range(30))  # fails gopher
    leaked = clean + " held out eval sequence"  # fails decontam

    d = tmp_path / "fc_in"
    d.mkdir()
    store = str(tmp_path / "fc_store")
    out = str(tmp_path / "fc_out")
    ckpt = str(tmp_path / "fc_ckpt")
    pairs = str(tmp_path / "fc_pairs")
    labels = str(tmp_path / "fc_labels")

    _write_docs(d / "b0.json", [(1, clean), (2, junk), (3, leaked)])
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    gated = decontam_filter(gopher_filter(stream), bits)
    q = (
        gated.writeStream.foreachBatch(
            lambda df, bid: dedup_ingest.dedup_ingest_batch(df, bid, store, out, pairs_dir=pairs)
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # batch 1: a near-dup of the clean doc plus another clean doc
    other = " ".join(f"omega{i % 5} psi chi the of texty" for i in range(10))
    _write_docs(d / "b1.json", [(4, clean + " indeed"), (5, other)])
    q.processAllAvailable()
    q.stop()

    survivors = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert survivors == {1, 5}, survivors

    # fold the provenance pairs into the label store and resolve
    pair_df = spark.read.parquet(pairs).select(
        F.col("dropped_id").alias("doc_a"), F.col("kept_id").alias("doc_b")
    )
    cluster_store.update_labels(spark, labels, pair_df)
    lab = cluster_store.read_labels(spark, labels)
    resolved = cluster_store.canonicalize(
        spark.createDataFrame([(1,), (4,), (5,)], "doc_id bigint"), lab
    )
    canon = {r.doc_id: r.canonical_id for r in resolved.collect()}
    assert canon == {1: 1, 4: 1, 5: 5}
