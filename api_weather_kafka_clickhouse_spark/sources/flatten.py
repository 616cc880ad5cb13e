"""Nested weather payload → flat 22-column fact rows.

Replaces the reference's hand-written extraction
(app/clickhouse_db.py:43-84 — SURVEY.md §2-A14..A18) with one
declarative select over `from_json`:

- `from_json(value, WEATHER_RAW_SCHEMA)` supersedes json.loads +
  per-field dict.get (A14);
- struct/array access + coalesce defaults reproduce the defensive
  `get(..., 0/'')` semantics exactly (A15/A16);
- epoch → timestamp for sunrise/sunset, NULL when absent — fixing the
  reference's non-nullable DateTime bug (§1.4);
- ingest-time audit columns stamped as UTC instants (A18), not
  Moscow wall time (§1.4).

Everything is built-in expressions inside whole-stage codegen — this
flattening runs at Kafka-source line rate on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schemas import WEATHER_RAW_SCHEMA


def parse_raw(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Bytes/string JSON → typed `raw` struct column. Corrupt JSON →
    NULL struct (the reference logs-and-drops, Consumer:174-175;
    callers filter `raw IS NULL` to match).

    from_json alone maps corrupt input to an all-null struct, not a
    NULL — `try_parse_json` (variant) supplies the syntactic validity
    gate so callers get a clean NULL to filter on.

    Deliberately TWO parses (reviewed and kept): the single-parse
    alternative — PERMISSIVE from_json with columnNameOfCorruptRecord
    — flags rows with field-level TYPE mismatches as corrupt too,
    but the contract (SURVEY §1.3) drops only syntactically invalid
    JSON and keeps mismatched fields as NULL→default. Only
    try_parse_json distinguishes the two cases.
    """
    value = F.col(value_col).cast("string")
    return df.withColumn(
        "raw",
        F.when(
            F.try_parse_json(value).isNotNull(),
            F.from_json(value, WEATHER_RAW_SCHEMA),
        ),
    )


def _num(path: str, out_type: str, default: int = 0) -> Column:
    return F.coalesce(F.col(path), F.lit(default)).cast(out_type)


def _epoch_ts(path: str) -> Column:
    # NULL stays NULL (nullable TimestampType — §1.4 fix).
    # timestamp_seconds converts directly; the from_unixtime →
    # to_timestamp round-trip formatted every value through a
    # session-timezone string for the same result
    return F.timestamp_seconds(F.col(path))


def _fact_columns(r: str, event_time: Column) -> list[Column]:
    """The 22 fact columns, column-for-column parity with the
    reference INSERT tuple (clickhouse_db.py:60-83)."""
    # try_element_at: empty/missing weather array → NULL → '' default
    # (ANSI-mode element_at would error; reference default at :45)
    first_weather = F.try_element_at(F.col(f"{r}.weather"), F.lit(1))
    return [
        F.to_date(event_time).alias("event_date"),
        event_time.alias("event_time"),
        F.coalesce(F.col(f"{r}.name"), F.lit("")).alias("city_name"),
        _num(f"{r}.timezone", "int").alias("timezone"),
        F.coalesce(F.col(f"{r}.sys.country"), F.lit("")).alias("country"),
        _num(f"{r}.coord.lon", "float").alias("longitude"),
        _num(f"{r}.coord.lat", "float").alias("latitude"),
        F.coalesce(first_weather.getField("main"), F.lit("")).alias("weather_main"),
        F.coalesce(first_weather.getField("description"), F.lit("")).alias(
            "weather_description"
        ),
        _num(f"{r}.main.temp", "decimal(5,2)").alias("temperature"),
        _num(f"{r}.main.feels_like", "decimal(5,2)").alias("feels_like"),
        _num(f"{r}.main.temp_min", "decimal(5,2)").alias("temp_min"),
        _num(f"{r}.main.temp_max", "decimal(5,2)").alias("temp_max"),
        _num(f"{r}.main.pressure", "int").alias("pressure"),
        _num(f"{r}.main.humidity", "int").alias("humidity"),
        _num(f"{r}.visibility", "int").alias("visibility"),
        _num(f"{r}.wind.speed", "decimal(4,2)").alias("wind_speed"),
        _num(f"{r}.wind.deg", "int").alias("wind_degree"),
        _num(f"{r}.wind.gust", "decimal(4,2)").alias("wind_gust"),
        _num(f"{r}.clouds.all", "int").alias("cloudiness"),
        _epoch_ts(f"{r}.sys.sunrise").alias("sunrise"),
        _epoch_ts(f"{r}.sys.sunset").alias("sunset"),
    ]


def flatten_weather(parsed: DataFrame, raw_col: str = "raw") -> DataFrame:
    """`raw` struct → 22 fact columns; event_time = ingest UTC instant
    (the reference's arrival-time stamping, clickhouse_db.py:61-62)."""
    return parsed.select(*_fact_columns(raw_col, F.current_timestamp()))


def flatten_weather_event_time(parsed: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Variant keyed on the payload's own `dt` (event time) — the
    capability the reference discards (SURVEY.md §2-C): event_date /
    event_time come from the observation itself, enabling watermarks
    and event-time windows downstream (streaming/windows.py)."""
    ev = F.to_timestamp(F.from_unixtime(F.col(f"{raw_col}.dt")))
    return parsed.select(*_fact_columns(raw_col, ev))
