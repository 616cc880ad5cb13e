"""Table-loading contract: every query must run on a DRIVER-OWNED
session (the driver builds its own SparkSession and calls queries()
directly — nothing guarantees entry() or session.get_spark ran first).
"""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark.tables import load


def test_load_events_does_not_mutate_session_timezone(spark, tmp_path):
    """round-5 review: tables.load force-set session.timeZone=UTC as a
    read side effect, silently shifting every later timestamp
    rendering in a session deliberately pinned elsewhere. The NTZ
    normalization must leave the caller's zone untouched AND still
    yield UTC-instant semantics (the cast binds its zone at analysis,
    under the temporary UTC pin)."""
    import datetime

    from pyspark.sql import functions as F

    # craft an NTZ events.parquet so the session-zone-sensitive path
    # runs regardless of the driver testdata's current physical type
    spark.sql(
        "select 1 as event_id, timestamp_ntz'2024-03-15 12:00:00' as ts"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load(spark, "events", str(tmp_path))
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York", (
            "loading a table must not mutate the caller's session timezone"
        )
        assert dict(df.dtypes)["ts"] == "timestamp"
        # the instant equals the NTZ wall time read as UTC — even
        # though the collect itself runs under the New_York session
        [r] = df.select(F.unix_micros("ts").alias("us")).collect()
        expect = int(
            datetime.datetime(
                2024, 3, 15, 12, 0, 0, tzinfo=datetime.timezone.utc
            ).timestamp()
            * 1_000_000
        )
        assert r.us == expect
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


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
