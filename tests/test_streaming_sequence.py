"""Streaming sequence matcher == batch events_sequence_match: the
events table replayed as chronological micro-batches must emit
exactly the pairs the batch operator aggregates, state surviving the
batch boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.streaming.sequence_match import (
    sequence_matches,
)
from api_weather_kafka_clickhouse_spark.tables import load

pytestmark = pytest.mark.slow

SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"


def _replay_in_batches(spark, sf_dir, tmp_path, n_batches: int):
    """Write the events table as n chronological parquet chunks and
    drive the stateful query one chunk at a time."""
    ev = (
        load(spark, "events", sf_dir)
        .select("user_id", "ts", "event_type", "event_id")
        .orderBy("ts", "event_id")
        .collect()
    )
    chunk = (len(ev) + n_batches - 1) // n_batches
    src = tmp_path / "seq_in"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        sequence_matches(stream)
        .writeStream.format("memory")
        .queryName("seq_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        for i in range(n_batches):
            rows = ev[i * chunk : (i + 1) * chunk]
            if not rows:
                continue
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM seq_out").collect()


def test_stream_equals_batch_operator(spark, sf_dir, tmp_path):
    matches = _replay_in_batches(spark, sf_dir, tmp_path, n_batches=4)
    # aggregate the emitted pairs the way the batch operator does
    got: dict = {}
    for m in matches:
        agg = got.setdefault(m.user_id, [0, None, None])
        agg[0] += 1
        agg[1] = m.s_ts if agg[1] is None else min(agg[1], m.s_ts)
        agg[2] = m.p_ts if agg[2] is None else min(agg[2], m.p_ts)
    expect = {
        r.user_id: (r.n_matches, r.first_signup, r.first_purchase)
        for r in registry.all_specs()["events_sequence_match"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert {u: tuple(v) for u, v in got.items()} == expect
    # pairs must not duplicate across batches (append mode, state-held)
    keys = [(m.user_id, m.s_ts, m.p_ts) for m in matches]
    assert len(keys) == len(set(keys))


def test_state_machine_rules_unit(spark, tmp_path):
    """Hand-built stream: a broken signup never matches, a lapsed one
    expires, one purchase serves multiple pending signups, and state
    crosses batch boundaries."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes=0, days=0):
        return t0 + dt.timedelta(minutes=minutes, days=days)

    b0 = [
        (1, ts(0), "signup", 1),
        (1, ts(1), "signup", 2),  # two pending
        (2, ts(0), "signup", 3),
        (2, ts(1), "error", 4),  # breaks user 2's pending signup
        (3, ts(0), "signup", 5),  # will lapse (purchase after 8 days)
    ]
    b1 = [
        (1, ts(10), "purchase", 6),  # matches BOTH pending signups
        (2, ts(10), "purchase", 7),  # matches nothing (broken)
        (3, ts(0, days=8), "purchase", 8),  # lapsed window
        (1, ts(20), "purchase", 9),  # nothing pending anymore
    ]
    src = tmp_path / "unit_in"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        sequence_matches(stream)
        .writeStream.format("memory")
        .queryName("seq_unit")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "unit_ckpt"))
        .start()
    )
    try:
        for batch in (b0, b1):
            spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM seq_unit").collect()
    got = sorted((r.user_id, r.s_ts, r.p_ts) for r in rows)
    assert got == [
        (1, ts(0), ts(10)),
        (1, ts(1), ts(10)),
    ]
