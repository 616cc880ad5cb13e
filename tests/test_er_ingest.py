"""Incremental streaming entity resolution: new records are blocked
against the persistent index, verified with true Damerau-Levenshtein,
linked via the pairs log, and folded into the persistent cluster
label store; golden records materialize from the maintained state."""

from __future__ import annotations

import json

import pytest

from api_weather_kafka_clickhouse_spark.streaming import cluster_store, er_ingest

# minutes-scale streaming suite -> slow lane (pytest.ini)
pytestmark = pytest.mark.slow


# 18-char TPC-H-style names; the block key is nation | first 16 chars,
# so the N1 family shares a block within one nation:
N1 = "Customer#000000010"
N1_TYPO = "Customer#000000011"  # DL 1 from N1, same block
N1_LONG = "Customer#0000000105"  # DL 1 from N1, same block, LONGER name
FAR = "Customer#000000999"  # DL 3 from N1; differs inside the prefix too
OTHER_BLOCK = "Customer#100000010"  # DL 1 from N1 but differs INSIDE the prefix


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "rec_id long, name string, nation long, bal_cents long"
    )


def _dirs(tmp_path):
    return (
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "labels"),
    )


def test_er_links_across_and_within_batches(spark, tmp_path):
    store, pairs, labels = _dirs(tmp_path)
    # batch 0: two unlinked records (different blocks / far names)
    er_ingest.er_ingest_batch(
        _batch(spark, [(1, N1, 5, 1000), (2, FAR, 5, 1000)]), 0, store, pairs, labels
    )
    lab0 = cluster_store.read_labels(spark, labels)
    assert lab0.count() == 0  # no links yet -> empty labeling

    # batch 1: 3 matches stored 1 (DL 1, same nation, close balance);
    # 4 and 5 match each other within the batch; 6 is clean
    er_ingest.er_ingest_batch(
        _batch(
            spark,
            [
                (3, N1_TYPO, 5, 40_000),
                (4, N1, 9, 500),
                (5, N1_TYPO, 9, 600),
                (6, FAR, 9, 600),
            ],
        ),
        1,
        store,
        pairs,
        labels,
    )
    lab = {
        r["doc_id"]: r["canonical_id"]
        for r in cluster_store.read_labels(spark, labels).collect()
    }
    assert lab[3] == 1 and lab[5] == 4
    logged = {
        (r["doc_a"], r["doc_b"]) for r in spark.read.parquet(pairs).collect()
    }
    assert (3, 1) in logged and (4, 5) in logged
    assert not any(6 in p or 2 in p for p in logged)

    golden = {
        r["entity_id"]: r
        for r in er_ingest.resolve_golden(spark, store, labels).collect()
    }
    # entities: {1,3}, {4,5}, {2}, {6}
    assert set(golden) == {1, 2, 4, 6}
    assert golden[1]["n_sources"] == 2
    assert golden[1]["canonical_key"] == 1
    assert golden[1]["best_bal_cents"] == 40_000
    assert golden[4]["n_sources"] == 2
    assert golden[4]["modal_nation"] == 9
    assert golden[2]["n_sources"] == 1


def test_er_verify_rejects_and_blocking_recall_documented(spark, tmp_path):
    store, pairs, labels = _dirs(tmp_path)
    er_ingest.er_ingest_batch(
        _batch(
            spark,
            [
                (1, N1, 5, 1000),
                # same block, DL 1, but DIFFERENT nation -> different
                # block key too (nation rides the key) and the verify
                # would also reject: no link
                (2, N1_TYPO, 6, 1000),
                # same block + nation, DL 1, balance too far: no link
                (3, N1_TYPO, 5, 1000 + 50_000),
                # DL 3 AND a different block: no link either way
                (4, FAR, 5, 1000),
                # true DL-1 match but the edit is INSIDE the block
                # prefix -> lands in another block: the documented
                # blocking-recall miss (er_funnel's batch sweep with
                # sort-adjacency would catch it)
                (5, OTHER_BLOCK, 5, 1000),
            ],
        ),
        0,
        store,
        pairs,
        labels,
    )
    # nothing matched: the pairs store holds no rows (an all-empty
    # history may not even create the directory — read via read_store)
    from api_weather_kafka_clickhouse_spark.streaming.store import read_store

    assert read_store(spark, pairs, "doc_a bigint, doc_b bigint").count() == 0
    assert cluster_store.read_labels(spark, labels).count() == 0


def test_er_golden_prefers_longest_name_and_merges_transitively(spark, tmp_path):
    store, pairs, labels = _dirs(tmp_path)
    # chain across batches: 1~3 (batch 1), then 7 matches 3 (batch 2)
    # -> {1, 3, 7} all one entity with canonical 1
    er_ingest.er_ingest_batch(_batch(spark, [(1, N1, 5, 1000)]), 0, store, pairs, labels)
    er_ingest.er_ingest_batch(
        _batch(spark, [(3, N1_TYPO, 5, 2000)]), 1, store, pairs, labels
    )
    er_ingest.er_ingest_batch(
        _batch(spark, [(7, N1_LONG, 5, 3000)]), 2, store, pairs, labels
    )
    lab = {
        r["doc_id"]: r["canonical_id"]
        for r in cluster_store.read_labels(spark, labels).collect()
    }
    assert lab[3] == 1 and lab[7] == 1
    golden = {
        r["entity_id"]: r
        for r in er_ingest.resolve_golden(spark, store, labels).collect()
    }
    assert golden[1]["n_sources"] == 3
    assert golden[1]["golden_name"] == N1_LONG  # longest name survives
    assert golden[1]["best_bal_cents"] == 3000


def test_er_ingest_batch_is_replay_idempotent(spark, tmp_path):
    store, pairs, labels = _dirs(tmp_path)
    er_ingest.er_ingest_batch(_batch(spark, [(1, N1, 5, 1000)]), 0, store, pairs, labels)
    b1 = _batch(spark, [(3, N1_TYPO, 5, 2000), (4, FAR, 5, 100)])
    for _ in range(2):  # crash-between-sink-and-commit replay
        er_ingest.er_ingest_batch(b1, 1, store, pairs, labels)
    assert spark.read.parquet(store + "/attrs").count() == 3
    assert spark.read.parquet(pairs).count() == 1
    lab = {
        r["doc_id"]: r["canonical_id"]
        for r in cluster_store.read_labels(spark, labels).collect()
    }
    # labels carry every vertex of the pair graph, canonicals included
    assert lab == {1: 1, 3: 1}
    # duplicate rec_ids within one batch collapse deterministically
    er_ingest.er_ingest_batch(
        _batch(spark, [(9, FAR, 7, 1), (9, N1, 7, 1)]), 2, store, pairs, labels
    )
    nine = spark.read.parquet(store + "/attrs").filter("rec_id = 9").collect()
    assert len(nine) == 1 and nine[0]["name"] == N1  # smallest (name, ...) tuple


def test_er_same_batch_update_verifies_with_current_attrs(spark, tmp_path):
    """When an attribute update for X and a potential match Y arrive in
    the SAME micro-batch, the store-vs-batch candidate (Y, X_stored)
    must be verified against X's CURRENT version (round-14 ADVICE): a
    link the current attributes reject must never form via the stale
    stored copy — ER merges are irreversible."""
    from api_weather_kafka_clickhouse_spark.streaming.store import read_store

    store, pairs, labels = _dirs(tmp_path)
    er_ingest.er_ingest_batch(_batch(spark, [(1, N1, 5, 1000)]), 0, store, pairs, labels)
    # same batch: X's balance moves OUT of range of Y; the stored copy
    # (bal 1000, within SNM_BAL_CENTS of Y) must not win the verify
    er_ingest.er_ingest_batch(
        _batch(spark, [(1, N1, 5, 200_000), (2, N1_TYPO, 5, 1500)]),
        1,
        store,
        pairs,
        labels,
    )
    assert read_store(spark, pairs, "doc_a bigint, doc_b bigint").count() == 0
    assert cluster_store.read_labels(spark, labels).count() == 0

    # the coalesce keeps the OLD-block candidate path alive (fresh
    # store): X's update renames it INSIDE the block prefix (new block
    # != stored block), and Z blocks with X's STORED key — the
    # candidate comes from the stored block row, the verify must use
    # the new name (DL 2 from Z) and new balance: link expected. A
    # plain anti-join of stored attrs would have dropped this pair.
    store2, pairs2, labels2 = (
        str(tmp_path / "store2"),
        str(tmp_path / "pairs2"),
        str(tmp_path / "labels2"),
    )
    er_ingest.er_ingest_batch(
        _batch(spark, [(1, N1, 5, 1000)]), 0, store2, pairs2, labels2
    )
    er_ingest.er_ingest_batch(
        _batch(spark, [(1, OTHER_BLOCK, 5, 1600), (3, N1_TYPO, 5, 1500)]),
        1,
        store2,
        pairs2,
        labels2,
    )
    lab = {
        r["doc_id"]: r["canonical_id"]
        for r in cluster_store.read_labels(spark, labels2).collect()
    }
    assert lab == {1: 1, 3: 1}


def test_er_streaming_wiring_end_to_end(spark, tmp_path):
    d = tmp_path / "er_in"
    d.mkdir()
    store, pairs, labels = _dirs(tmp_path)
    (d / "b0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"rec_id": 1, "name": N1, "nation": 5, "bal_cents": 1000},
                {"rec_id": 2, "name": N1_TYPO, "nation": 5, "bal_cents": 900},
            ]
        )
    )
    stream = spark.readStream.schema(
        "rec_id long, name string, nation long, bal_cents long"
    ).json(str(d))
    q = er_ingest.start_er_ingest(
        stream, store, pairs, labels, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    lab = {
        r["doc_id"]: r["canonical_id"]
        for r in cluster_store.read_labels(spark, labels).collect()
    }
    assert lab == {1: 1, 2: 1}
    golden = er_ingest.resolve_golden(spark, store, labels).collect()
    assert len(golden) == 1 and golden[0]["n_sources"] == 2


def test_reconcile_store_repairs_blocking_recall_miss(spark, tmp_path):
    """The documented streaming recall miss (an edit INSIDE the block
    prefix lands in another block) is repaired by the scheduled
    reconcile_store sweep: sort-adjacency over the store's current
    attrs finds the link, folds it monotonically into the label
    store, and a re-run is an idempotent no-op (no repairs, no label
    swap)."""
    store, pairs, labels = _dirs(tmp_path)
    er_ingest.er_ingest_batch(_batch(spark, [(1, N1, 5, 1000)]), 0, store, pairs, labels)
    er_ingest.er_ingest_batch(
        _batch(spark, [(5, OTHER_BLOCK, 5, 1000)]), 1, store, pairs, labels
    )
    # streaming alone: different blocks -> never paired
    assert cluster_store.read_labels(spark, labels).count() == 0

    got = er_ingest.reconcile_store(spark, store, pairs, labels, -2)
    assert got == {"swept_pairs": 1, "new_links": 1}
    lab = {
        r["doc_id"]: r["canonical_id"]
        for r in cluster_store.read_labels(spark, labels).collect()
    }
    assert lab == {1: 1, 5: 1}
    golden = er_ingest.resolve_golden(spark, store, labels).collect()
    assert len(golden) == 1 and golden[0]["n_sources"] == 2

    # idempotent re-run: the same pair sweeps again but repairs nothing
    again = er_ingest.reconcile_store(spark, store, pairs, labels, -2)
    assert again == {"swept_pairs": 1, "new_links": 0}
    # non-negative ids would collide with streaming ingest partitions,
    # and -1 is the store layout's COMPACTED_BATCH_ID sentinel — a sweep
    # under it would overwrite the compacted pairs history (round-15
    # ADVICE fix: the guard is now <= -2)
    with pytest.raises(ValueError, match="COMPACTED_BATCH_ID"):
        er_ingest.reconcile_store(spark, store, pairs, labels, 2)
    with pytest.raises(ValueError, match="compaction sentinel"):
        er_ingest.reconcile_store(spark, store, pairs, labels, -1)
    lab2 = {
        r["doc_id"]: r["canonical_id"]
        for r in cluster_store.read_labels(spark, labels).collect()
    }
    assert lab2 == lab


def test_er_reingested_record_is_an_update_not_a_self_match(spark, tmp_path):
    """A re-sent rec_id (attribute update — a normal MDM stream event)
    must not self-match against its own stored copy, must not inflate
    n_sources, and its LATEST version must win survivorship."""
    from api_weather_kafka_clickhouse_spark.streaming.store import read_store

    store, pairs, labels = _dirs(tmp_path)
    er_ingest.er_ingest_batch(_batch(spark, [(1, N1, 5, 1000)]), 0, store, pairs, labels)
    er_ingest.er_ingest_batch(_batch(spark, [(1, N1, 5, 2500)]), 1, store, pairs, labels)
    assert read_store(spark, pairs, "doc_a bigint, doc_b bigint").count() == 0
    golden = er_ingest.resolve_golden(spark, store, labels).collect()
    assert len(golden) == 1
    assert golden[0]["n_sources"] == 1
    assert golden[0]["best_bal_cents"] == 2500  # the update won
    # the update must still LINK forward: a true match arriving later
    # verifies against the CURRENT balance, not the stale one
    er_ingest.er_ingest_batch(
        _batch(spark, [(2, N1_TYPO, 5, 2600)]), 2, store, pairs, labels
    )
    lab = {
        r["doc_id"]: r["canonical_id"]
        for r in cluster_store.read_labels(spark, labels).collect()
    }
    assert lab == {1: 1, 2: 1}
