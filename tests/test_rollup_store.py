"""Incremental summing rollup: merge-on-read equals the batch twin,
decimal partials keep the merge exact, replay is idempotent,
compaction pre-sums via the shared crash-safe swap, and a replay of
a folded batch refuses instead of double-counting."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.streaming import rollup_store
from api_weather_kafka_clickhouse_spark.tables import load

pytestmark = pytest.mark.slow

SPECS = registry.all_specs()


def _rollup_set(df):
    return {
        (r.bucket, r.event_type, r.n, r.value_sum) for r in df.collect()
    }


def _batches(spark, sf_dir, n=3):
    e = load(spark, "events", sf_dir)
    return [e.filter(F.col("event_id") % n == i) for i in range(n)]


def test_rollup_merge_equals_batch_twin_and_replay(spark, sf_dir, tmp_path):
    store = str(tmp_path / "rollup")
    batches = _batches(spark, sf_dir)
    for bid, b in enumerate(batches):
        rollup_store.rollup_ingest_batch(b, bid, store)

    want = _rollup_set(SPECS["time_bucket_hourly"].fn(spark, sf_dir))
    assert _rollup_set(rollup_store.read_rollup(spark, store)) == want

    # replay the last batch: identical partial, identical store
    rollup_store.rollup_ingest_batch(batches[-1], len(batches) - 1, store)
    assert _rollup_set(rollup_store.read_rollup(spark, store)) == want

    # compaction pre-sums to one partition and preserves the result
    assert rollup_store.compact_rollup(spark, store) == 1
    parts_dir = os.path.join(store, "parts")
    parts = [p for p in os.listdir(parts_dir) if p.startswith("ingest_batch=")]
    assert parts == ["ingest_batch=-1"]
    assert _rollup_set(rollup_store.read_rollup(spark, store)) == want

    # new batches keep folding after compaction...
    import datetime

    extra = spark.createDataFrame(
        [(10**9, datetime.datetime(2024, 1, 1, 0, 30), 5, "click", 1.25, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rollup_store.rollup_ingest_batch(extra, len(batches), store)
    merged = {
        (r.bucket, r.event_type): (r.n, r.value_sum)
        for r in rollup_store.read_rollup(spark, store).collect()
    }

    k = (datetime.datetime(2024, 1, 1, 0, 0), "click")
    base = {(b, t): (n, v) for b, t, n, v in want}
    base_n, base_v = base.get(k, (0, 0.0))
    assert merged[k][0] == base_n + 1
    assert merged[k][1] == pytest.approx(base_v + 1.25, abs=1e-9)

    # ...but a replay of a batch whose partition was folded away must
    # refuse loudly: rewriting it would double-count
    with pytest.raises(RuntimeError, match="compacted away"):
        rollup_store.rollup_ingest_batch(batches[0], 0, store)


def test_rollup_stream_wiring(spark, tmp_path):
    import json

    d = tmp_path / "rollup_in"
    d.mkdir()
    store = str(tmp_path / "rollup_s")
    ckpt = str(tmp_path / "rollup_c")
    rows = [
        (1, "2024-01-01 10:05:00", "view", 2.0),
        (2, "2024-01-01 10:55:00", "view", 3.5),
        (3, "2024-01-01 11:05:00", "click", 1.0),
    ]
    (d / "b0.json").write_text(
        "\n".join(
            json.dumps({"event_id": i, "ts": ts, "event_type": t, "value": v})
            for i, ts, t, v in rows
        )
    )
    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).json(str(d))
    q = rollup_store.start_rollup_ingest(stream, store, ckpt)
    q.processAllAvailable()
    q.stop()
    got = _rollup_set(rollup_store.read_rollup(spark, store))
    import datetime

    assert got == {
        (datetime.datetime(2024, 1, 1, 10, 0), "view", 2, 5.5),
        (datetime.datetime(2024, 1, 1, 11, 0), "click", 1, 1.0),
    }


# --------------------------------------- property: merge == direct agg


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# (hour 0-3, type A/B, cents) — coarse domains force key collisions
# across batches so the merge path actually merges
_ev = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["A", "B"]),
    st.integers(min_value=-(10**6), max_value=10**6),
)


@given(
    evs=st.lists(_ev, min_size=1, max_size=30),
    perm=st.randoms(use_true_random=False),
)
@settings(
    max_examples=6,  # each example folds real Spark micro-batches
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rollup_fold_is_batch_order_independent_and_exact(spark, tmp_path_factory, evs, perm):
    import datetime

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1, h, 30),
            1,
            t,
            c / 100.0,
            "{}",
        )
        for i, (h, t, c) in enumerate(evs)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    # random batch split AND random order within/among batches: the
    # decimal partials must make the merged result identical to the
    # direct aggregate regardless of fold order
    shuffled = rows[:]
    perm.shuffle(shuffled)
    k = perm.randint(1, 3)
    batches = [shuffled[i::k] for i in range(k)]
    store = str(tmp_path_factory.mktemp("rollup_prop") / "store")
    for bid, chunk in enumerate(batches):
        if chunk:
            rollup_store.rollup_ingest_batch(
                spark.createDataFrame(chunk, schema), bid, store
            )
    got = _rollup_set(rollup_store.read_rollup(spark, store))
    import collections
    import decimal

    agg = collections.defaultdict(lambda: [0, decimal.Decimal(0)])
    for _, ts, _, t, v, _ in rows:
        key = (ts.replace(minute=0), t)
        agg[key][0] += 1
        agg[key][1] += decimal.Decimal(f"{v:.2f}")
    want = {(b, t, n, float(s)) for (b, t), (n, s) in agg.items()}
    assert got == want
