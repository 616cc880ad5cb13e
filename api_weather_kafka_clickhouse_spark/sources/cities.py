"""City dimension operators (reference app/city_loader.py — SURVEY.md
§2-A1..A6, A10).

The reference loads a JSON array into Python lists and does per-row
dict work; here the dimension is a DataFrame from day one so the
same operators run unchanged whether the city list has 82 rows or a
planet-scale 10M-row location dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .schemas import CITY_SCHEMA

N_TOPICS = 3
TOPIC_PREFIX = "weather_topic_"
DEFAULT_TOPIC = f"{TOPIC_PREFIX}3"  # reference fallback (Producer:86-92)


def load_cities(spark: SparkSession, path: str, country: str = "RU") -> DataFrame:
    """JSON scan + equality filter (A1+A2: city_loader.py:7-24).

    multiLine because the source is one JSON array, not JSONL.
    Explicit schema — no sampling pass, deterministic types.
    """
    df = spark.read.schema(CITY_SCHEMA).json(path, multiLine=True)
    return df.filter(F.col("country") == country)


def assign_topics(cities: DataFrame, n_topics: int = N_TOPICS) -> DataFrame:
    """Round-robin topic assignment (A3+A4: city_loader.py:26-44).

    The reference sorts by name then assigns i % 3. A global
    row_number reproduces that exactly; for a dimension this size the
    single-partition window is fine. (For data-scale round-robin
    balancing, use df.repartition(n) and skip the determinism.)
    """
    w = Window.orderBy("name")
    return cities.withColumn(
        "topic",
        F.concat(
            F.lit(TOPIC_PREFIX),
            (F.pmod(F.row_number().over(w) - 1, F.lit(n_topics)) + 1).cast("string"),
        ),
    )


def city_coordinates(cities: DataFrame) -> DataFrame:
    """Projection to (name, lat, lon) (A5: city_loader.py:53-57)."""
    return cities.select("name", F.col("coord.lat").alias("lat"), F.col("coord.lon").alias("lon"))


def lookup_city(cities: DataFrame, name: str):
    """Point lookup (A6: city_loader.py:46-51) — a filter, pushed to
    the scan, instead of the reference's linear list walk."""
    return cities.filter(F.col("name") == name).first()


def route_topic(df: DataFrame, routing: DataFrame, city_col: str = "name") -> DataFrame:
    """Topic routing via broadcast join with default (A10:
    Producer_clickhouse.py:86-92). `routing` is (name, topic)."""
    r = routing.select(F.col("name").alias("_r_name"), "topic")
    return (
        df.join(F.broadcast(r), df[city_col] == F.col("_r_name"), "left")
        .withColumn("topic", F.coalesce("topic", F.lit(DEFAULT_TOPIC)))
        .drop("_r_name")
    )
