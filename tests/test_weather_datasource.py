"""Python Data Source tests: batch read partitions/routing/error
semantics, flatten round-trip, and the streaming polling loop with
checkpointed cycle offsets (SURVEY §2-A7/A11 as a native source)."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.sources import weather_datasource as wds
from api_weather_kafka_clickhouse_spark.sources.flatten import flatten_weather, parse_raw
from tests.test_cities import FIXTURE


@pytest.fixture()
def cities_path(tmp_path):
    p = tmp_path / "cities.json"
    p.write_text(json.dumps(FIXTURE))
    return str(p)


@pytest.fixture()
def registered(spark):
    wds.register(spark)
    return spark


def test_batch_read_routes_and_catches(registered, cities_path):
    df = (
        registered.read.format(wds.FORMAT_NAME)
        .option("cities_path", cities_path)
        .option("fetcher", "fake")
        .load()
    )
    rows = df.collect()
    # all RU cities present (RU filter at plan time), sorted round-robin
    assert len(rows) == 6
    assert {r.topic for r in rows} == {"weather_topic_1", "weather_topic_2", "weather_topic_3"}
    # one partition per topic — the A4 round-robin IS the partitioning
    assert df.rdd.getNumPartitions() == 3
    # the deterministic outage city yields a NULL payload, not a fail
    failed = [r for r in rows if r.value is None]
    assert len(failed) == 1 and failed[0].lat > 59
    ok = [r for r in rows if r.value is not None]
    assert all(json.loads(r.value)["coord"]["lat"] == r.lat for r in ok)


def test_batch_read_feeds_flatten(registered, cities_path):
    df = (
        registered.read.format(wds.FORMAT_NAME)
        .option("cities_path", cities_path)
        .load()
        .filter(F.col("value").isNotNull())
    )
    fact = flatten_weather(parse_raw(df, "value"))
    rows = fact.collect()
    assert len(rows) == 5
    assert all(r.city_name.startswith("city@") for r in rows)


def test_unknown_fetcher_option_raises(registered, cities_path):
    df = (
        registered.read.format(wds.FORMAT_NAME)
        .option("cities_path", cities_path)
        .option("fetcher", "nope")
        .load()
    )
    with pytest.raises(Exception, match="unknown fetcher"):
        df.collect()


def test_stream_polls_one_sweep_per_batch(registered, cities_path, tmp_path):
    q = (
        registered.readStream.format(wds.FORMAT_NAME)
        .option("cities_path", cities_path)
        .load()
        .writeStream.format("memory")
        .queryName("weather_poll")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 60
        # wait until at least two poll cycles (micro-batches) landed
        done = []
        while time.time() < deadline:
            done = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if len(done) >= 2:
                break
            time.sleep(0.5)
        assert len(done) >= 2, "stream never produced two sweeps"
        total = registered.sql("SELECT count(*) AS n FROM weather_poll").first().n
        # each completed sweep contributes exactly the 6 RU cities
        assert total % 6 == 0 and total >= 12
    finally:
        q.stop()
