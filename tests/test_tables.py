"""Table-loading contract: every query must run on a DRIVER-OWNED
session (the driver builds its own SparkSession and calls queries()
directly — nothing guarantees entry() or session.get_spark ran first).
"""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark.tables import load


def test_events_reads_without_entry_or_get_spark(spark, sf_dir):
    """events.parquet is TIMESTAMP(NANOS); the nanosAsLong conf is
    runtime-mutable and tables.load sets it itself, so a driver-fresh
    session (no entry(), no get_spark defaults) still reads the table
    (round-2 verdict item 5)."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load(spark, "events", sf_dir)
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.limit(5).count() == 5
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
