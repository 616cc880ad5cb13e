"""Declared schemas for the weather pipeline's three data shapes
(FIXTURES.md §1-3; reference field extraction app/clickhouse_db.py:
43-84 and DDL app/clickhouse_ddl.sql:5-33).

The reference's stream schema is implicit (`dict.get` chains with
defaults); here it is an explicit StructType so `from_json` replaces
the hand-written parser and corrupt rows become NULL rows instead of
log-and-drop (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# city_list.json shape (reference app/city_loader.py:7-24)
CITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField(
            "coord",
            T.StructType(
                [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
            ),
        ),
    ]
)

# OpenWeatherMap /data/2.5/weather payload as consumed by the
# reference consumer (app/clickhouse_db.py:45-82)
WEATHER_RAW_SCHEMA = T.StructType(
    [
        T.StructField(
            "coord",
            T.StructType(
                [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
            ),
        ),
        T.StructField(
            "weather",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("main", T.StringType()),
                        T.StructField("description", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "main",
            T.StructType(
                [
                    T.StructField("temp", T.DoubleType()),
                    T.StructField("feels_like", T.DoubleType()),
                    T.StructField("temp_min", T.DoubleType()),
                    T.StructField("temp_max", T.DoubleType()),
                    T.StructField("pressure", T.IntegerType()),
                    T.StructField("humidity", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("visibility", T.IntegerType()),
        T.StructField(
            "wind",
            T.StructType(
                [
                    T.StructField("speed", T.DoubleType()),
                    T.StructField("deg", T.IntegerType()),
                    T.StructField("gust", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("clouds", T.StructType([T.StructField("all", T.IntegerType())])),
        T.StructField("dt", T.LongType()),
        T.StructField(
            "sys",
            T.StructType(
                [
                    T.StructField("country", T.StringType()),
                    T.StructField("sunrise", T.LongType()),
                    T.StructField("sunset", T.LongType()),
                ]
            ),
        ),
        T.StructField("timezone", T.IntegerType()),  # signed: fixes §1.4 UInt16 bug
        T.StructField("name", T.StringType()),
    ]
)

# flat 22-column fact table (reference app/clickhouse_ddl.sql:5-33,
# types mapped per SURVEY.md §1.2 with the §1.4 fixes: signed
# timezone, nullable sunrise/sunset, UTC instants)
WEATHER_FACT_SCHEMA = T.StructType(
    [
        T.StructField("event_date", T.DateType(), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("city_name", T.StringType(), False),
        T.StructField("timezone", T.IntegerType()),
        T.StructField("country", T.StringType()),
        T.StructField("longitude", T.FloatType()),
        T.StructField("latitude", T.FloatType()),
        T.StructField("weather_main", T.StringType()),
        T.StructField("weather_description", T.StringType()),
        T.StructField("temperature", T.DecimalType(5, 2)),
        T.StructField("feels_like", T.DecimalType(5, 2)),
        T.StructField("temp_min", T.DecimalType(5, 2)),
        T.StructField("temp_max", T.DecimalType(5, 2)),
        T.StructField("pressure", T.IntegerType()),
        T.StructField("humidity", T.IntegerType()),
        T.StructField("visibility", T.IntegerType()),
        T.StructField("wind_speed", T.DecimalType(4, 2)),
        T.StructField("wind_degree", T.IntegerType()),
        T.StructField("wind_gust", T.DecimalType(4, 2)),
        T.StructField("cloudiness", T.IntegerType()),
        T.StructField("sunrise", T.TimestampType(), True),
        T.StructField("sunset", T.TimestampType(), True),
    ]
)

FACT_COLUMNS = [f.name for f in WEATHER_FACT_SCHEMA.fields]
