"""Golden ingest tests: raw OpenWeatherMap-shaped JSON → flatten/cast
pipeline vs hand-computed flat rows, covering every defensive path of
the reference consumer (missing fields, empty arrays, corrupt JSON —
FIXTURES.md §2 edge cases)."""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.sources.flatten import (
    flatten_weather,
    flatten_weather_event_time,
    parse_raw,
)
from api_weather_kafka_clickhouse_spark.sources.schemas import FACT_COLUMNS

FULL_PAYLOAD = {
    "coord": {"lon": 37.62, "lat": 55.75},
    "weather": [{"main": "Clouds", "description": "overcast clouds"}],
    "main": {
        "temp": -7.34,
        "feels_like": -12.1,
        "temp_min": -8.0,
        "temp_max": -6.5,
        "pressure": 1021,
        "humidity": 84,
    },
    "visibility": 9000,
    "wind": {"speed": 3.5, "deg": 250, "gust": 7.2},
    "clouds": {"all": 90},
    "dt": 1700000000,
    "sys": {"country": "XX", "sunrise": 1699999000, "sunset": 1700030000},
    "timezone": 10800,
    "name": "Fixture City",
}

SPARSE_PAYLOAD = {  # exercises every default path
    "weather": [],
    "main": {},
    "wind": {"speed": 1.0},
    "sys": {},
    "dt": 1700000300,
    "name": "Sparse City",
    "timezone": -10800,  # negative offset: the §1.4 UInt16 bug case
}

CORRUPT_LINE = '{"name": "broken", '


def _messages(spark):
    lines = [json.dumps(FULL_PAYLOAD), json.dumps(SPARSE_PAYLOAD), CORRUPT_LINE]
    return spark.createDataFrame([(v,) for v in lines], "value string")


def test_flatten_full_payload(spark):
    parsed = parse_raw(_messages(spark), "value")
    out = flatten_weather(parsed.filter(F.col("raw").isNotNull()))
    assert out.columns == FACT_COLUMNS
    row = out.filter(F.col("city_name") == "Fixture City").collect()[0]
    assert row.country == "XX"
    assert row.weather_main == "Clouds"
    assert row.temperature == Decimal("-7.34")
    assert row.wind_gust == Decimal("7.20")
    assert row.pressure == 1021
    assert abs(row.longitude - 37.62) < 1e-5
    assert row.timezone == 10800
    assert row.sunrise == dt.datetime(2023, 11, 14, 21, 56, 40)  # UTC
    assert row.event_date == row.event_time.date()


def test_flatten_defaults_and_negative_timezone(spark):
    parsed = parse_raw(_messages(spark), "value")
    out = flatten_weather(parsed.filter(F.col("raw").isNotNull()))
    row = out.filter(F.col("city_name") == "Sparse City").collect()[0]
    # defensive defaults: '' / 0 parity with clickhouse_db.py:45-82
    assert row.weather_main == "" and row.weather_description == ""
    assert row.temperature == Decimal("0.00")
    assert row.pressure == 0 and row.humidity == 0 and row.visibility == 0
    assert row.wind_speed == Decimal("1.00")
    assert row.wind_degree == 0 and row.wind_gust == Decimal("0.00")
    assert row.country == ""
    assert row.sunrise is None and row.sunset is None  # §1.4 nullable fix
    assert row.timezone == -10800  # §1.4 signed fix


def test_unknown_fields_are_ignored(spark):
    """Forward compatibility: payloads carrying fields the schema
    doesn't know (new API versions) must flatten identically — parity
    with the reference's dict.get tolerance (clickhouse_db.py:45-82),
    which never inspects unknown keys."""
    extra = dict(
        FULL_PAYLOAD,
        new_top_level_field={"a": 1},
        base="stations",
        main={**FULL_PAYLOAD["main"], "sea_level": 1021, "grnd_level": 1000},
        sys={**FULL_PAYLOAD["sys"], "id": 12345, "type": 2},
    )
    msgs = spark.createDataFrame(
        [(json.dumps(FULL_PAYLOAD),), (json.dumps(extra),)], "value string"
    )
    out = flatten_weather(parse_raw(msgs, "value").filter(F.col("raw").isNotNull()))
    rows = out.drop("event_time", "event_date").collect()
    assert len(rows) == 2
    assert rows[0] == rows[1], "unknown fields changed the flatten result"


def test_corrupt_json_yields_null_raw(spark):
    parsed = parse_raw(_messages(spark), "value")
    assert parsed.filter(F.col("raw").isNull()).count() == 1
    ok = flatten_weather(parsed.filter(F.col("raw").isNotNull()))
    assert ok.count() == 2


def test_event_time_variant_uses_dt(spark):
    parsed = parse_raw(_messages(spark), "value").filter(F.col("raw").isNotNull())
    out = flatten_weather_event_time(parsed)
    times = {r.city_name: r.event_time for r in out.collect()}
    assert times["Fixture City"] == dt.datetime(2023, 11, 14, 22, 13, 20)
    assert times["Sparse City"] == dt.datetime(2023, 11, 14, 22, 18, 20)
