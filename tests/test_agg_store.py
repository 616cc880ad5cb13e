"""AggregatingMergeTree-style state store: merge-on-read equals the
direct aggregate (exact for n/sum/min/max/avg, sketch-bounded for
uniq), states survive compaction unchanged, fold order is irrelevant,
replay is idempotent, and a folded-batch replay refuses."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.streaming import agg_store
from api_weather_kafka_clickhouse_spark.tables import load

pytestmark = pytest.mark.slow


def _batches(spark, sf_dir, n=3):
    e = load(spark, "events", sf_dir)
    return [e.filter(F.col("event_id") % n == i) for i in range(n)]


def _exact_rows(df):
    # everything except the sketch estimate (exact across any fold)
    return {
        (r.bucket, r.event_type, r.n, r.value_sum, r.v_min, r.v_max, r.v_avg)
        for r in df.collect()
    }


def _full_rows(df):
    return {tuple(r) for r in df.collect()}


def test_agg_states_merge_exact_and_sketch_bounded(spark, sf_dir, tmp_path):
    store = str(tmp_path / "aggst")
    batches = _batches(spark, sf_dir)
    for bid, b in enumerate(batches):
        agg_store.agg_state_batch(b, bid, store)

    e = load(spark, "events", sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    direct = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).cast("decimal(18,2)").cast("double").alias("value_sum"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        (F.sum(v).cast("decimal(18,2)").cast("double") / F.count(F.lit(1))).alias(
            "v_avg"
        ),
        F.countDistinct("user_id").alias("exact_uniq"),
    )
    got = agg_store.read_agg(spark, store)
    assert _exact_rows(got) == {
        (r.bucket, r.event_type, r.n, r.value_sum, r.v_min, r.v_max, r.v_avg)
        for r in direct.collect()
    }
    # the HLL estimate honors its accuracy contract per key (3% is
    # >3 sigma at lgK=12)
    exact = {(r.bucket, r.event_type): r.exact_uniq for r in direct.collect()}
    for r in got.collect():
        ex = exact[(r.bucket, r.event_type)]
        assert abs(r.uniq_users - ex) <= max(1, 0.03 * ex), (r, ex)

    full_before = _full_rows(got)

    # replay of an existing batch partition is idempotent
    agg_store.agg_state_batch(batches[-1], len(batches) - 1, store)
    assert _full_rows(agg_store.read_agg(spark, store)) == full_before

    # fold order is irrelevant, INCLUDING the sketch estimates
    # (register-wise max is commutative)
    store2 = str(tmp_path / "aggst2")
    for bid, b in enumerate(reversed(batches)):
        agg_store.agg_state_batch(b, bid, store2)
    assert _full_rows(agg_store.read_agg(spark, store2)) == full_before

    # compaction pre-merges states without changing ANY read value
    assert agg_store.compact_agg(spark, store) == 1
    parts_dir = os.path.join(store, "parts")
    parts = [p for p in os.listdir(parts_dir) if p.startswith("ingest_batch=")]
    assert parts == ["ingest_batch=-1"]
    assert _full_rows(agg_store.read_agg(spark, store)) == full_before

    # replay of a batch whose partition was folded away refuses
    with pytest.raises(RuntimeError, match="compacted away"):
        agg_store.agg_state_batch(batches[0], 0, store)


def test_agg_stream_wiring(spark, tmp_path):
    import datetime
    import json

    d = tmp_path / "agg_in"
    d.mkdir()
    store = str(tmp_path / "agg_s")
    ckpt = str(tmp_path / "agg_c")
    rows = [
        (1, "2024-01-01 10:05:00", 7, "view", 2.0),
        (2, "2024-01-01 10:55:00", 8, "view", 3.5),
        (3, "2024-01-01 10:58:00", 7, "view", 1.5),
        (4, "2024-01-01 11:05:00", 9, "click", 1.0),
    ]
    (d / "b0.json").write_text(
        "\n".join(
            json.dumps(
                {"event_id": i, "ts": ts, "user_id": u, "event_type": t, "value": v}
            )
            for i, ts, u, t, v in rows
        )
    )
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    stream = spark.readStream.schema(schema).json(str(d))
    q = agg_store.start_agg_ingest(stream, store, ckpt)
    q.processAllAvailable()
    q.stop()
    got = {
        (r.bucket, r.event_type): (r.n, r.value_sum, r.v_min, r.v_max, r.uniq_users)
        for r in agg_store.read_agg(spark, store).collect()
    }
    assert got == {
        (datetime.datetime(2024, 1, 1, 10, 0), "view"): (3, 7.0, 1.5, 3.5, 2),
        (datetime.datetime(2024, 1, 1, 11, 0), "click"): (1, 1.0, 1.0, 1.0, 1),
    }
