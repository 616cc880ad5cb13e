"""Incrementally-maintained rollup — a streaming materialized view.

The warehouse layer answers per-city/day aggregates by scanning the
fact table (`app.warehouse_summary`); this module maintains the same
answer incrementally: each micro-batch writes its PARTIAL aggregates
(count + exact decimal sum — commutative, associative, mergeable) and
readers merge partials. At 100 TB the read side touches the tiny
rollup table instead of the fact table, and the write side does one
map-side-combined aggregate per micro-batch.

Exactly-once without a transactional table format: each batch's
partials land in a `batch_id=<n>` partition written with DYNAMIC
partition overwrite, so a replayed micro-batch (checkpoint recovery,
supervisor restart) overwrites its own partition instead of
double-appending — the idempotent-foreachBatch pattern the reference's
commit-after-insert only approximates
(reference app/Consumer_clickhouse.py:160-165, with ClickHouse's
insert dedup explicitly disabled at app/clickhouse_db.py:23).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

ROLLUP_KEYS = ("event_date", "city_name")


def _batch_partials(batch_df: DataFrame) -> DataFrame:
    return batch_df.groupBy(*ROLLUP_KEYS).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("temperature").cast("decimal(18,2)")).alias("t_sum"),
        F.min("temperature").alias("t_min"),
        F.max("temperature").alias("t_max"),
    )


def start_rollup(
    fact_stream: DataFrame,
    rollup_path: str,
    checkpoint: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Maintain per-(event_date, city_name) partials from the typed
    fact stream (`pipeline.transform` output)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            _batch_partials(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(rollup_path)
        )

    writer = fact_stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _last_committed_batch(checkpoint: str) -> int:
    """Highest batch id the checkpoint has COMMITTED (sink completed
    AND offset recorded). Batches written to the rollup but not yet
    committed can replay after a crash, so compaction must not fold
    them."""
    commits_dir = os.path.join(checkpoint, "commits")
    try:
        ids = [int(f) for f in os.listdir(commits_dir) if f.isdigit()]
    except FileNotFoundError:
        return -1
    return max(ids, default=-1)


def compact_rollup(spark: SparkSession, rollup_path: str, checkpoint: str) -> None:
    """Merge committed batch partitions into one — run periodically
    (or on stream shutdown) so a long-lived trigger doesn't
    accumulate one tiny partition per micro-batch and read_rollup
    stays a scan of a few files.

    Replay safety: only partitions with batch_id <= the checkpoint's
    last COMMITTED batch are folded into the `batch_id=-1` compacted
    partition; a batch that was written but not committed (crash
    between sink and commit) keeps its own partition, so when the
    restarted stream replays it, the dynamic overwrite replaces that
    partition instead of double-counting against the compacted data.
    OFFLINE maintenance: stop the rollup stream first — the directory
    rewrite is not atomic with concurrent writes.
    """
    committed = _last_committed_batch(checkpoint)
    partials = spark.read.parquet(rollup_path)
    foldable = partials.filter(F.col("batch_id") <= committed)
    keep = partials.filter(F.col("batch_id") > committed)
    merged = (
        foldable.groupBy(*ROLLUP_KEYS)
        .agg(
            F.sum("n_obs").alias("n_obs"),
            F.sum("t_sum").alias("t_sum"),
            F.min("t_min").alias("t_min"),
            F.max("t_max").alias("t_max"),
        )
        .withColumn("batch_id", F.lit(-1))
        .unionByName(keep)
    )
    # stage distributed (never collect), rewrite, then drop staging
    staging = rollup_path.rstrip("/") + "__compacting"
    merged.write.mode("overwrite").parquet(staging)
    (
        spark.read.parquet(staging)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(rollup_path)
    )
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(spark._jsc.hadoopConfiguration())
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Merge the partials: counts and exact decimal sums add, min/max
    combine — identical to aggregating the fact table directly."""
    partials = spark.read.parquet(rollup_path)
    return partials.groupBy(*ROLLUP_KEYS).agg(
        F.sum("n_obs").alias("n_obs"),
        F.min("t_min").alias("t_min"),
        F.max("t_max").alias("t_max"),
        (F.sum("t_sum").cast("double") / F.sum("n_obs")).alias("t_avg"),
    )
