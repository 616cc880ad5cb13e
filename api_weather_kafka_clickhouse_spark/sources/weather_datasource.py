"""The weather API as a first-class Spark source: a PySpark 4 Python
Data Source (`spark.dataSource.register`) wrapping the HTTP fetch.

Re-expresses reference app/Producer_clickhouse.py:64-142 (SURVEY.md
§2-A7 HTTP source + §2-A11 polling loop) the way Spark 4 wants it:

- ``spark.read.format("weather_api")`` — one batch sweep over the
  city dimension; the reader PLANS one input partition per Kafka
  topic (§2-A4's round-robin assignment becomes Spark partition
  planning), so the fetch parallelizes across executors with no
  driver-side loop and each partition carries its topic label
  (§2-A10 routing).
- ``spark.readStream.format("weather_api")`` — the polling loop as a
  micro-batch stream: each batch is one full city sweep, the offset
  is the cycle counter, and the 300 s cadence is the stream trigger
  (``Trigger.ProcessingTime``), not a ``sleep()``. Restart replays
  from the checkpointed cycle — at-least-once, the reference's own
  contract (Consumer commit-after-insert, SURVEY §2-A20).

The fetcher is selected by OPTION (options are strings — a Python
data source is pickled to executors, so a callable can't ride in):
``fetcher=fake`` is the deterministic in-repo fake (tests, demos);
``fetcher=requests`` builds the real OpenWeatherMap client from the
``api_key`` option at read time on the executor. Per-city failures
yield NULL payloads — catch-log-skip parity (Producer:128-130).

City planning metadata (load → filter RU → sort by name, §2-A1-A3)
is read with plain ``json`` at plan time, exactly like a JDBC source
lists its partitions — the per-row work stays in executors.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .cities import N_TOPICS, TOPIC_PREFIX

FORMAT_NAME = "weather_api"
SCHEMA_DDL = "name string, lat double, lon double, topic string, value string"


def _load_cities(path: str) -> list[dict]:
    """Plan-time city dimension: parse, filter RU, sort by name
    (reference app/city_loader.py:7-29)."""
    with open(path, encoding="utf-8") as f:
        cities = json.load(f)
    kept = [c for c in cities if c.get("country") == "RU"]
    return sorted(kept, key=lambda c: c["name"])


def _fake_fetch(lat: float, lon: float) -> dict:
    """Deterministic offline payload in the OpenWeatherMap shape —
    a pure function of the coordinates, so tests and demos are
    reproducible on any partitioning."""
    if lat > 59:  # deterministic synthetic outage (catch-skip path)
        raise ConnectionError("synthetic outage")
    return {
        "coord": {"lon": lon, "lat": lat},
        "weather": [{"main": "Clouds", "description": "overcast clouds"}],
        "main": {
            "temp": round(30.0 - abs(lat) / 3.0, 2),
            "feels_like": round(28.0 - abs(lat) / 3.0, 2),
            "temp_min": round(29.0 - abs(lat) / 3.0, 2),
            "temp_max": round(31.0 - abs(lat) / 3.0, 2),
            "pressure": 1013,
            "humidity": 60,
        },
        "visibility": 10000,
        "wind": {"speed": 3.5, "deg": 180, "gust": 5.1},
        "clouds": {"all": 90},
        "sys": {"country": "RU", "sunrise": 1700000000, "sunset": 1700030000},
        "timezone": 10800,
        "name": f"city@{lat}",
    }


def _build_fetcher(options: dict):
    kind = options.get("fetcher", "fake")
    if kind == "fake":
        return _fake_fetch
    if kind == "requests":
        from .http_weather import make_requests_fetcher

        api_key = options.get("api_key")
        if not api_key:
            raise ValueError("fetcher=requests needs an api_key option")
        return make_requests_fetcher(api_key)
    raise ValueError(f"unknown fetcher {kind!r} (expected 'fake' or 'requests')")


def _topic(i: int) -> str:
    # topic contract owned by cities.py — one edit point for fan-out
    return f"{TOPIC_PREFIX}{i % N_TOPICS + 1}"


def _sweep(cities: list[dict], options: dict) -> Iterator[tuple]:
    """Fetch every city in this slice; NULL payload on failure."""
    fetcher = _build_fetcher(options)
    for c in cities:
        lat, lon = c["coord"]["lat"], c["coord"]["lon"]
        try:
            value = json.dumps(fetcher(lat, lon))
        except Exception:
            value = None
        yield (c["name"], lat, lon, c["topic"], value)


def _assigned(options: dict) -> list[dict]:
    cities = _load_cities(options["cities_path"])
    return [dict(c, topic=_topic(i)) for i, c in enumerate(cities)]


class _TopicPartition(InputPartition):
    def __init__(self, cities: list[dict]):
        self.cities = cities


class WeatherBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)

    def partitions(self) -> list[InputPartition]:
        """One input partition per topic — the reference's 3-topic
        round-robin becomes Spark's unit of fetch parallelism."""
        assigned = _assigned(self.options)
        by_topic: dict[str, list[dict]] = {}
        for c in assigned:
            by_topic.setdefault(c["topic"], []).append(c)
        return [_TopicPartition(cs) for _, cs in sorted(by_topic.items())]

    def read(self, partition: _TopicPartition) -> Iterator[tuple]:
        return _sweep(partition.cities, self.options)


class WeatherSimpleStreamReader(SimpleDataSourceStreamReader):
    """§2-A11's ``while True: sweep; sleep(300)`` as a micro-batch
    stream: offset = completed-cycle counter; one batch = one sweep.
    ``readBetweenOffsets`` re-fetches on replay — at-least-once, the
    reference's delivery contract (duplicates possible on crash,
    never loss)."""

    def __init__(self, options: dict):
        self.options = dict(options)

    def initialOffset(self) -> dict:
        return {"cycle": 0}

    def read(self, start: dict):
        rows = list(_sweep(_assigned(self.options), self.options))
        return iter(rows), {"cycle": start["cycle"] + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return _sweep(_assigned(self.options), self.options)


class WeatherDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return WeatherBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> WeatherSimpleStreamReader:
        return WeatherSimpleStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WeatherDataSource)
