"""Shared persistent-store machinery for the incremental ingest
modules (``dedup_ingest`` for text, ``embedding_ingest`` for
vectors): batch-partitioned parquet tables with replay-aware reads
and crash-safe compaction.

Layout contract (per table): plain parquet, Hive-partitioned by the
ingest batch id (``ingest_batch=<n>``), so a replayed micro-batch
overwrites its own partition — the idempotent-foreachBatch pattern of
sources/sink.py. A long-running deployment accumulates one (tiny)
partition dir per micro-batch; ``compact_tables`` folds the history
into a single ``ingest_batch=-1`` partition at a quiescent point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPACTED_BATCH_ID = -1


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FS API, so hdfs:///s3a://
    stores work identically to local paths (an os.path.isdir gate
    would silently treat every remote store as empty — no dedup, no
    error)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def read_store(
    spark: SparkSession,
    path: str,
    schema: str,
    exclude_batch: int | None = None,
    only_batch: int | None = None,
) -> DataFrame:
    """Read one store table; missing/empty dirs are an empty store,
    not an error. ``exclude_batch`` hides a replayed batch's own
    partial first-attempt writes; ``only_batch`` selects exactly one
    partition (re-reading what a batch just wrote)."""
    if fs_exists(spark, path):
        from pyspark.errors import AnalysisException

        try:
            df = spark.read.option("basePath", path).parquet(path)
            df.schema  # force schema inference now, inside the try
        except AnalysisException:
            # the dir exists but holds no data files (a crash between
            # partition deletes/writes, or an all-empty history) — an
            # empty store, not an error
            return spark.createDataFrame([], schema)
        if exclude_batch is not None:
            # a REPLAYED micro-batch must not see its own first
            # attempt's partial store writes: every doc would
            # self-match and the whole batch would be dropped
            df = df.filter(F.col("ingest_batch") != exclude_batch)
        if only_batch is not None:
            df = df.filter(F.col("ingest_batch") == only_batch)
        # drop the partition column — consumers key on the id only
        return df.select(*[f.split(" ")[0] for f in schema.split(", ")])
    return spark.createDataFrame([], schema)


def append_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Write ``df`` as the store partition for ``batch_id`` — dynamic
    partition overwrite, so a replayed batch rewrites its own
    partition instead of double-appending."""
    (
        df.withColumn("ingest_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(path)
    )


def compact_tables(
    spark: SparkSession, store_dir: str, tables: tuple[tuple[str, str], ...]
) -> int:
    """Fold each table's one-partition-per-batch history into a single
    ``ingest_batch=-1`` partition; returns how many tables were
    rewritten.

    MUST run at a QUIESCENT point: no in-flight batch, no pending
    replay (the swap below briefly moves the table aside, and a
    concurrent batch reading a missing store would dedup against
    nothing). A replay arriving AFTER compaction degrades safely: the
    replayed batch's rows are already in the compacted partition, so
    every row self-matches, the batch admits nothing, and its (empty)
    partition writes change no data.

    Crash safety: the swap is rename-aside → rename-tmp-in →
    delete-aside, so at every instant at least one COMPLETE copy of
    the table exists under the live path, ``__compact_tmp``, or
    ``__compact_old``; on entry any dangling state from a previous
    crash is recovered first (tmp renamed into a missing live path, a
    leftover aside copy deleted once the live path is complete).
    Rerunning compaction after a crash at ANY step therefore
    converges with the index intact. A delete-old-then-rename
    ordering instead has a window where the table exists only in
    ``__compact_tmp`` and a rerun's existence check skips it — every
    later batch then reads an EMPTY store and silently re-admits
    near-dups of the entire history (the round-5 review finding this
    module's ordering exists to prevent).
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    rewritten = 0
    for sub, schema in tables:
        path = os.path.join(store_dir, sub)
        tmp = path + "__compact_tmp"
        aside = path + "__compact_old"
        p_live = jvm.org.apache.hadoop.fs.Path(path)
        p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
        p_aside = jvm.org.apache.hadoop.fs.Path(aside)
        fs = p_live.getFileSystem(conf)

        # -- recovery of a previous crashed run, in dependency order --
        # crash between rename-aside and rename-in: the only complete
        # copy is tmp (aside holds the pre-compaction history; tmp is
        # written from it, so tmp is the newer complete state)
        if fs.exists(p_tmp) and not fs.exists(p_live):
            if not fs.rename(p_tmp, p_live):
                raise IOError(f"compact recovery: rename {tmp} -> {path} failed")
        # crash before delete-aside (live is complete) — or, with the
        # branch above, the aside left from a rename-in crash
        if fs.exists(p_aside) and fs.exists(p_live):
            fs.delete(p_aside, True)
        # a stale tmp beside a complete live table (crash between the
        # tmp write and rename-aside) is simply overwritten below

        if not fs_exists(spark, path):
            continue
        df = read_store(spark, path, schema)
        (
            df.withColumn("ingest_batch", F.lit(COMPACTED_BATCH_ID))
            .write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(tmp)
        )
        # -- the swap; rename returns FALSE on failure (no throw) --
        if not fs.rename(p_live, p_aside):
            raise IOError(f"compact: rename {path} -> {aside} failed")
        if not fs.rename(p_tmp, p_live):
            # put the old table back so the store is never left missing
            fs.rename(p_aside, p_live)
            raise IOError(f"compact: rename {tmp} -> {path} failed")
        fs.delete(p_aside, True)
        rewritten += 1
    return rewritten
