"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose every operator registered in
``api_weather_kafka_clickhouse_spark.registry`` (one entry per
implemented operator from SURVEY.md §2) for the driver's DuckDB
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from api_weather_kafka_clickhouse_spark import registry  # noqa: E402
from api_weather_kafka_clickhouse_spark.tables import SMOKE_SF_DIR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by nation x month over lineitem ⋈ orders ⋈ customer ⋈
    nation — scan → fact join → broadcast dims → aggregate.
    """
    # events.ts is parquet TIMESTAMP(NANOS); ensure the session the
    # driver hands us can read it (see tables.load).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fn = registry.queries()["join_flagship_revenue"]
    return fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.oracle_sql()
