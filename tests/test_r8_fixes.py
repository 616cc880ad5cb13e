"""Round-8 hardening regressions (the round-7 advice items):

- EVERY streaming store wiring — not only the centroid store — now
  threads the checkpoint's query id into its batch body, so a
  recreated checkpoint over a kept dedup/embedding/segment/curation
  store refuses loud before any partition write instead of silently
  replacing the old run's partitions,
- the centroid store's private run-guard copies were replaced by the
  shared store.py helpers (one implementation of crash-safety logic),
- curate_batch no longer runs a per-batch ``pairs.limit(1).count()``
  Spark job just to decide whether to fold labels — batch-pair
  presence is read off the partition listing (one driver FS stat).
"""

from __future__ import annotations

import os

import pytest

from api_weather_kafka_clickhouse_spark.streaming import store as store_mod
from api_weather_kafka_clickhouse_spark.streaming.curation import curate_batch, curation_dirs
from api_weather_kafka_clickhouse_spark.streaming.dedup_ingest import dedup_ingest_batch
from api_weather_kafka_clickhouse_spark.streaming.embedding_ingest import embedding_ingest_batch
from api_weather_kafka_clickhouse_spark.streaming.segment_ingest import segment_ingest_batch


def _docs(spark, start, texts):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


LONG_A = " ".join(f"tok{i}" for i in range(60))
LONG_B = " ".join(f"word{i}" for i in range(60))


# ------------------------------------------------- dedup ingest guard


def test_dedup_ingest_checkpoint_reset_raises(spark, tmp_path):
    base = str(tmp_path / "dd")
    store, surv = os.path.join(base, "s"), os.path.join(base, "v")
    dedup_ingest_batch(_docs(spark, 0, [LONG_A]), 0, store, surv, run_id="run-A")
    with pytest.raises(RuntimeError, match="checkpoint was reset"):
        dedup_ingest_batch(_docs(spark, 10, [LONG_B]), 0, store, surv, run_id="run-B")


def test_dedup_ingest_same_run_and_legacy_ok(spark, tmp_path):
    base = str(tmp_path / "dd2")
    store, surv = os.path.join(base, "s"), os.path.join(base, "v")
    dedup_ingest_batch(_docs(spark, 0, [LONG_A]), 0, store, surv, run_id="run-A")
    dedup_ingest_batch(_docs(spark, 10, [LONG_B]), 1, store, surv, run_id="run-A")
    # and a store built WITHOUT a run id keeps working batch-style
    base2 = str(tmp_path / "dd3")
    dedup_ingest_batch(
        _docs(spark, 0, [LONG_A]), 0, os.path.join(base2, "s"), os.path.join(base2, "v")
    )


def test_dedup_ingest_unmarked_store_refuses_stream(spark, tmp_path):
    """A store built by direct batch calls (scheme record present, no
    run marker) later driven by a stream cannot compare batch ids."""
    base = str(tmp_path / "dd4")
    store, surv = os.path.join(base, "s"), os.path.join(base, "v")
    dedup_ingest_batch(_docs(spark, 0, [LONG_A]), 0, store, surv)  # legacy
    with pytest.raises(RuntimeError, match="no _stream_run record"):
        dedup_ingest_batch(_docs(spark, 10, [LONG_B]), 1, store, surv, run_id="run-A")


# -------------------------------------- embedding / segment guards


def test_embedding_ingest_checkpoint_reset_raises(spark, tmp_path):
    base = str(tmp_path / "em")
    store, surv = os.path.join(base, "s"), os.path.join(base, "v")
    vecs = spark.createDataFrame(
        [(0, [float(i) for i in range(64)])], "vec_id bigint, vec array<double>"
    )
    embedding_ingest_batch(vecs, 0, store, surv, run_id="run-A")
    with pytest.raises(RuntimeError, match="checkpoint was reset"):
        embedding_ingest_batch(vecs, 0, store, surv, run_id="run-B")


def test_segment_ingest_checkpoint_reset_raises(spark, tmp_path):
    base = str(tmp_path / "sg")
    store, out = os.path.join(base, "s"), os.path.join(base, "o")
    segment_ingest_batch(_docs(spark, 0, [LONG_A]), 0, store, out, run_id="run-A")
    with pytest.raises(RuntimeError, match="checkpoint was reset"):
        segment_ingest_batch(_docs(spark, 10, [LONG_B]), 0, store, out, run_id="run-B")


# ------------------------------------------------- curation guard + fold


def test_curate_batch_threads_run_id_to_store(spark, tmp_path):
    dirs = curation_dirs(str(tmp_path / "cur"))
    curate_batch(_docs(spark, 0, [LONG_A]), 0, dirs, None, run_id="run-A")
    with pytest.raises(RuntimeError, match="checkpoint was reset"):
        curate_batch(_docs(spark, 10, [LONG_B]), 0, dirs, None, run_id="run-B")


def test_curate_batch_no_pairs_skips_label_fold(spark, tmp_path):
    """Two dissimilar docs produce no provenance pairs: the labels
    store must stay untouched (absent), proving the fold is gated on
    the partition listing, not a Spark job over an empty frame."""
    dirs = curation_dirs(str(tmp_path / "cur2"))
    curate_batch(_docs(spark, 0, [LONG_A, LONG_B]), 0, dirs, None)
    assert not os.path.exists(os.path.join(dirs["labels"], "labels"))
    assert not os.path.exists(os.path.join(dirs["pairs"], "ingest_batch=0"))


def test_curate_batch_with_pairs_folds_labels(spark, tmp_path):
    from api_weather_kafka_clickhouse_spark.streaming.cluster_store import read_labels

    dirs = curation_dirs(str(tmp_path / "cur3"))
    # passes every Gopher rule (>=50 words, >=2 stopwords, mean len
    # 3-10) so both docs survive the gate and near-dup as a pair
    base = "the cat and the dog " + " ".join(f"tok{i}" for i in range(60))
    curate_batch(_docs(spark, 0, [base, base + " extra"]), 0, dirs, None)
    assert os.path.exists(os.path.join(dirs["pairs"], "ingest_batch=0"))
    labels = read_labels(spark, dirs["labels"])
    assert labels.count() >= 1  # the dropped near-dup got a canonical


# ------------------------------------------- shared-helper unification


def test_centroid_store_uses_shared_run_guard():
    from api_weather_kafka_clickhouse_spark.streaming import centroid_store as CS

    assert CS.verify_stream_run is store_mod.verify_stream_run
    assert CS.checkpoint_run_id is store_mod.checkpoint_run_id
    assert CS.RUN_FILE is store_mod.RUN_FILE
    assert not hasattr(CS, "_verify_run")
    assert not hasattr(CS, "_checkpoint_run_id")
