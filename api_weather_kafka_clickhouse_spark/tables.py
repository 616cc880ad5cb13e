"""Testdata table access.

The driver's tables (TESTDATA.md): TPC-H-ish ``region nation customer
supplier part orders lineitem`` plus ``events`` (stream stand-in) and
``documents`` / ``embeddings`` (LLM-data operators). One parquet file
per table under ``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # runtime-settable; needed for driver-owned sessions too.
        # Deliberately NOT restored: it only changes how TIMESTAMP
        # (NANOS) parquet — otherwise unreadable — is surfaced, and the
        # physical reader may consult it again at scan execution, long
        # after this function returned.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts has shipped as two physical parquet types across
        # driver testdata generations; normalize both to a TIMESTAMP
        # whose instant equals DuckDB's naive-UTC reading:
        # - TIMESTAMP(NANOS): read as nanos-since-epoch long under
        #   legacy.parquet.nanosAsLong; truncate to micros with integer
        #   `div` (matches DuckDB's ns→us cast). timestamp_micros is
        #   an instant constructor — session-TZ-independent.
        # - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as
        #   TIMESTAMP_NTZ; the cast to TIMESTAMP reinterprets wall
        #   time in the SESSION zone, so it must run under UTC.
        #   Catalyst binds the cast's zone at ANALYSIS, which is eager
        #   at DataFrame creation, so pinning the conf around the
        #   withColumn and restoring it leaves the caller's session
        #   zone untouched (round-5 review: a reader must not mutate
        #   global session state) while the plan keeps UTC semantics.
        #   Verified by tests/test_tables.py with a session pinned to
        #   America/New_York. Leaving ts NTZ instead would break every
        #   operator using instant functions (unix_micros, ...).
        from pyspark.sql import functions as F  # local: keep module import light

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            prev_tz = spark.conf.get("spark.sql.session.timeZone")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            try:
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            finally:
                spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view (mirrors the DuckDB oracle's
    pre-registered views) so SQL-flavored queries can run unchanged."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
