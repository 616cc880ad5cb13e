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


def test_state_bounded_without_purchase():
    """A user who signs up / errors but never purchases must not grow
    state forever: broken entries and window-lapsed entries are pruned
    at the end of every batch fold, not only when a purchase arrives."""
    import datetime as dt

    import pandas as pd

    from api_weather_kafka_clickhouse_spark.streaming.sequence_match import (
        _US_PER_DAY,
        _make_matcher,
    )

    class _FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self.value = None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v
            self.exists = True

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self.value = None
            self.exists = False

    upd = _make_matcher(7 * _US_PER_DAY, None)
    t0 = dt.datetime(2024, 1, 1)

    def pdf(rows):
        return pd.DataFrame(
            {
                "ts": pd.Series([t for t, _, _ in rows], dtype="datetime64[us]"),
                "event_type": [e for _, e, _ in rows],
                "event_id": [i for _, _, i in rows],
            }
        )

    # signup then error, no purchase ever: state drains to empty
    st = _FakeState()
    out = list(upd((1,), [pdf([(t0, "signup", 1), (t0 + dt.timedelta(minutes=1), "error", 2)])], st))
    assert out == []
    assert st.value == ([], [])

    # a signup whose window lapsed relative to later traffic is pruned;
    # a still-live signup survives the fold
    st2 = _FakeState()
    list(
        upd(
            (2,),
            [
                pdf(
                    [
                        (t0, "signup", 1),
                        (t0 + dt.timedelta(days=8), "signup", 2),
                    ]
                )
            ],
            st2,
        )
    )
    live = int(pd.Timestamp(t0 + dt.timedelta(days=8)).value // 1000)
    assert st2.value == ([live], [False])
