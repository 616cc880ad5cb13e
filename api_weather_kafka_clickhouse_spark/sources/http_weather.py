"""HTTP weather source (reference app/Producer_clickhouse.py:64-76 —
SURVEY.md §2-A7).

Spark has no native HTTP source, so the fetch is a `mapInPandas`
operator over the city DataFrame: each Arrow batch of cities issues
its requests inside the executor (parallel across partitions — the
reference fetches its 81 cities sequentially), yielding (name, topic,
value-json) rows ready for the Kafka/file sink.

The fetcher is injectable: production wires a real `requests`-based
callable (gated behind an import-try — the lib may be absent);
tests inject a deterministic fake. The operator's Spark surface
(schema, batching, error semantics) is identical either way —
per-city failures yield NULL payloads, mirroring the reference's
catch-log-skip (Producer:128-130).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

FetchFn = Callable[[float, float], dict]
# OpenWeatherMap endpoint shape, for the real fetcher (public API)
API_URL = "https://api.openweathermap.org/data/2.5/weather"

FETCH_RESULT_SCHEMA = "name string, lat double, lon double, value string"


def make_requests_fetcher(api_key: str, timeout: float = 10.0) -> FetchFn:
    """Real HTTP fetcher (units=metric like Producer:67-70). Raises
    ImportError at build time if `requests` is unavailable."""
    import requests  # gated: not guaranteed in the runtime image

    def fetch(lat: float, lon: float) -> dict:
        resp = requests.get(
            API_URL,
            params={"lat": lat, "lon": lon, "appid": api_key, "units": "metric"},
            timeout=timeout,
        )
        resp.raise_for_status()  # reference raises on HTTP error (Producer:71-75)
        data = resp.json()
        if not data:
            raise ValueError("empty weather payload")
        return data

    return fetch


def fetch_weather(cities: DataFrame, fetcher: FetchFn) -> DataFrame:
    """cities(name, coord.lat, coord.lon, ...) → (name, lat, lon,
    value) with value = raw JSON string (Kafka message body shape,
    Producer:147). Failed fetches → NULL value."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    payload = json.dumps(fetcher(row.lat, row.lon))
                except Exception:
                    payload = None  # catch-log-skip parity (Producer:128-130)
                out.append((row.name, row.lat, row.lon, payload))
            yield pd.DataFrame(out, columns=["name", "lat", "lon", "value"])

    from .cities import city_coordinates

    coords = city_coordinates(cities)
    return coords.mapInPandas(run, schema=FETCH_RESULT_SCHEMA)
