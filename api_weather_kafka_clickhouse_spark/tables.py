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
        # runtime-settable; needed for driver-owned sessions too
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the NTZ->timestamp normalization below reinterprets wall
        # time in the SESSION zone: a driver-owned session that never
        # went through get_spark()'s timeZone=UTC pinning would shift
        # every instant by the host offset, so pin it here too
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts has shipped as two physical parquet types across
        # driver testdata generations; normalize both to a session-TZ
        # TIMESTAMP (session TZ is pinned UTC, so values equal DuckDB's
        # naive-UTC reading either way):
        # - TIMESTAMP(NANOS): read as nanos-since-epoch long under
        #   legacy.parquet.nanosAsLong; truncate to micros with integer
        #   `div` (matches DuckDB's ns→us cast).
        # - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as
        #   TIMESTAMP_NTZ; cast reinterprets the wall time in the UTC
        #   session zone. Leaving it NTZ would break every operator
        #   using instant functions (unix_micros, unix_timestamp).
        from pyspark.sql import functions as F  # local: keep module import light

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view (mirrors the DuckDB oracle's
    pre-registered views) so SQL-flavored queries can run unchanged."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
