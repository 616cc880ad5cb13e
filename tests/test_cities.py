"""City dimension operator tests (SURVEY.md §2-A1..A6, A10) over a
synthesized fixture (same shape as the reference's city_list.json,
content invented here)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.sources import cities as C

FIXTURE = [
    {"id": 1, "name": "Alfatown", "state": "", "country": "RU", "coord": {"lon": 30.1, "lat": 59.9}},
    {"id": 2, "name": "Betaville", "state": "", "country": "RU", "coord": {"lon": 37.6, "lat": 55.7}},
    {"id": 3, "name": "Gamma Port", "state": "", "country": "RU", "coord": {"lon": 43.0, "lat": 56.3}},
    {"id": 4, "name": "Delta Springs", "state": "", "country": "RU", "coord": {"lon": 60.6, "lat": 56.8}},
    {"id": 5, "name": "Epsilon'sk", "state": "", "country": "RU", "coord": {"lon": 82.9, "lat": 55.0}},
    {"id": 6, "name": "Outland City", "state": "", "country": "XX", "coord": {"lon": 13.4, "lat": 52.5}},
    {"id": 7, "name": "Zeta Harbor", "state": "", "country": "RU", "coord": {"lon": 131.9, "lat": 43.1}},
]


@pytest.fixture(scope="module")
def city_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cities") / "city_list.json"
    p.write_text(json.dumps(FIXTURE))
    return str(p)


def test_load_filters_country(spark, city_path):
    df = C.load_cities(spark, city_path)
    assert df.count() == 6
    assert df.filter(F.col("country") != "RU").count() == 0


def test_assign_topics_round_robin(spark, city_path):
    df = C.assign_topics(C.load_cities(spark, city_path))
    rows = {r["name"]: r["topic"] for r in df.collect()}
    # sorted by name: Alfatown, Betaville, Delta Springs, Epsilon'sk,
    # Gamma Port, Zeta Harbor → topics 1,2,3,1,2,3
    assert rows["Alfatown"] == "weather_topic_1"
    assert rows["Betaville"] == "weather_topic_2"
    assert rows["Delta Springs"] == "weather_topic_3"
    assert rows["Epsilon'sk"] == "weather_topic_1"
    assert rows["Gamma Port"] == "weather_topic_2"
    assert rows["Zeta Harbor"] == "weather_topic_3"


def test_coordinates_and_lookup(spark, city_path):
    df = C.load_cities(spark, city_path)
    coords = {r.name: (r.lat, r.lon) for r in C.city_coordinates(df).collect()}
    assert coords["Betaville"] == (55.7, 37.6)
    hit = C.lookup_city(df, "Gamma Port")
    assert hit is not None and hit.id == 3
    assert C.lookup_city(df, "Nowhere") is None


def test_route_topic_default(spark, city_path):
    routed_cities = C.assign_topics(C.load_cities(spark, city_path))
    routing = routed_cities.select("name", "topic")
    stream = spark.createDataFrame(
        [("Betaville",), ("Unknown City",)], "name string"
    )
    out = {r.name: r.topic for r in C.route_topic(stream, routing).collect()}
    assert out["Betaville"] == "weather_topic_2"
    assert out["Unknown City"] == C.DEFAULT_TOPIC  # fallback parity
