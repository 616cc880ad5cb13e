"""Warehouse sink: partitioned, sort-ordered columnar table
(reference ClickHouse MergeTree layer — SURVEY.md §2-B3/B4/B5, §3.3).

The reference's `PARTITION BY toYYYYMM(event_date)` + `ORDER BY
(event_date, city_name, event_time)` (app/clickhouse_ddl.sql:30-32)
maps to:

- Hive-style `partitionBy(event_month)` → Catalyst partition pruning
  on event_month predicates (monthly pruning parity; date-ranged
  readers derive the month bound explicitly — `read_fact_between` —
  because Spark cannot infer month bounds from an event_date filter);
- `sortWithinPartitions(event_date, city_name, event_time)` before
  write → parquet min/max row-group stats ≈ MergeTree granule
  skipping for the sort-key prefix;
- parquet dictionary encoding ≈ LowCardinality(String) (free).

At 100 TB: the month partition bounds file counts, AQE coalescing
keeps file sizes sane, and `repartition(month, city_bucket)` before
the sort gives clustering without tiny files. A ClickHouse-compatible
JDBC write path is sketched for parity with A19 but the engine's
native warehouse is parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MONTH_COL = "event_month"
SORT_KEY = ("event_date", "city_name", "event_time")


def with_month(df: DataFrame) -> DataFrame:
    """Derive the partition column (toYYYYMM parity, ddl:31).

    Written as an INT yyyyMM, matching ClickHouse's toYYYYMM(Date) ->
    UInt32: with a string partition value, readers depended on Hive
    partition type inference + implicit ANSI casts to compare against
    int/date-derived bounds — pruning silently stopped if
    ``spark.sql.sources.partitionColumnTypeInference.enabled`` was
    false (round-4 advice). An int value round-trips identically with
    inference on or off."""
    return df.withColumn(MONTH_COL, F.date_format("event_date", "yyyyMM").cast("int"))


def write_fact(df: DataFrame, path: str, mode: str = "append") -> None:
    """Partitioned + sorted columnar append (B3/B4/B5)."""
    (
        with_month(df)
        .sortWithinPartitions(*SORT_KEY)
        .write.mode(mode)
        .partitionBy(MONTH_COL)
        .parquet(path)
    )


def write_fact_batch(df: DataFrame, path: str, batch_id: int) -> None:
    """Replay-idempotent micro-batch write: the batch lands in its own
    ``batch_id=<n>`` partition (then month) with DYNAMIC partition
    overwrite, so a micro-batch replayed after a crash-between-sink-
    and-commit OVERWRITES its own partitions instead of double-
    appending — the same idempotent-foreachBatch pattern as
    streaming/rollup.py, upgrading the reference's at-least-once
    commit-after-insert (Consumer:160-165) to effectively-exactly-once
    for deterministic batches."""
    (
        with_month(df)
        .withColumn("batch_id", F.lit(batch_id))
        .sortWithinPartitions(*SORT_KEY)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", MONTH_COL)
        .parquet(path)
    )


def read_fact(spark: SparkSession, path: str) -> DataFrame:
    """Read back. NOTE: pruning happens on the PARTITION column
    ``event_month`` — Spark does not derive a month predicate from an
    `event_date` filter (the functional relationship is unknown to
    Catalyst), so date-ranged readers must constrain event_month too;
    use read_fact_between."""
    return spark.read.parquet(path)


def read_fact_between(spark: SparkSession, path: str, start_date: str, end_date: str) -> DataFrame:
    """Date-range read with EXPLICIT month-partition pruning: the
    event_month predicate (derived driver-side from the date bounds)
    prunes directories, the event_date predicate then row-filters via
    parquet min/max stats on the sorted files — together, MergeTree
    partition + granule skipping parity."""
    months = (
        F.date_format(F.lit(start_date), "yyyyMM").cast("int"),
        F.date_format(F.lit(end_date), "yyyyMM").cast("int"),
    )
    return (
        spark.read.parquet(path)
        .filter(F.col(MONTH_COL).between(*months))
        .filter(F.col("event_date").between(F.lit(start_date), F.lit(end_date)))
    )


def jdbc_insert(df: DataFrame, url: str, table: str, properties: dict | None = None) -> None:
    """Batched warehouse INSERT parity (A19: clickhouse_db.py:87-96)
    via Spark's JDBC sink. Needs a ClickHouse JDBC driver jar on the
    classpath — absent in this image, so this path is exercised only
    when the driver is present."""
    writer = df.write.mode("append").format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
