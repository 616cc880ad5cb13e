"""Deterministic sharded JSONL export with a verifiable manifest —
the training-data handoff step: a curated corpus leaves the engine as
N hash-sharded JSONL directories plus a manifest recording each
shard's row count and an order-independent content signature, so the
consumer (a tokenizer / loader fleet) can verify every shard landed
intact without re-reading the source.

No reference counterpart (the reference archives raw API responses,
app/file_db.py); this is the LLM-pipeline-native export shape:

- shard = pmod(xxhash64(key), n_shards): pure function of the row
  key, so shard membership is reproducible across reruns, engines,
  and partitionings, and a re-export lands byte-compatible shards.
- One repartition on the shard id co-locates each shard, rows sorted
  by key within it -> stable on-disk order; Hive-style
  ``shard=<k>/`` directories via partitionBy.
- The manifest is ONE map-side-combined aggregation: per-shard count
  plus a commutative content signature (sum of per-row xxhash64 of
  the canonical JSON), so verification never depends on row order or
  file split boundaries.

At 100 TB: the single shuffle carries only the export columns, every
shard writes in parallel, and verify_export re-reads the landed files
once (parallel scan) — no driver-side data movement anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "shard"
_SIG_MOD = (1 << 63) - 1  # keep the commutative signature in bigint range


def _canonical_json(df: DataFrame, cols: list[str]) -> F.Column:
    """Canonical per-row JSON: columns in NAME order, because a JSONL
    round-trip does not preserve schema order (spark.read.json infers
    fields alphabetically) and the signature must survive it."""
    return F.to_json(F.struct(*[F.col(c) for c in sorted(cols)]))


def _with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    return df.withColumn(
        SHARD_COL, F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards)).cast("int")
    )


def manifest(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """(shard, n_rows, content_sig) for an export of `df` — computable
    BEFORE the write (from the source) and AFTER (from the landed
    files); equality is the integrity check. The signature sums
    per-row xxhash64 of the canonical JSON mod 2^63-1: commutative, so
    row order, file counts, and partitioning cannot affect it."""
    cols = [c for c in df.columns if c != SHARD_COL]
    sharded = df if SHARD_COL in df.columns else _with_shard(df, key_col, n_shards)
    row_sig = F.pmod(F.xxhash64(_canonical_json(sharded, cols)), F.lit(_SIG_MOD))
    # sum in DECIMAL(38,0): bigint would overflow under ANSI mode after
    # ~2 rows of 2^63-sized signatures; decimal holds ~1e19 rows/shard
    return (
        sharded.groupBy(SHARD_COL)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.pmod(F.sum(row_sig.cast("decimal(38,0)")), F.lit(_SIG_MOD))
            .cast("bigint")
            .alias("content_sig"),
        )
        .orderBy(SHARD_COL)
    )


def export_jsonl(
    df: DataFrame, path: str, key_col: str, n_shards: int = 16
) -> DataFrame:
    """Write `df` as `path/shard=<k>/*.json` (rows sorted by key
    within each shard) and `path/_manifest/` (parquet), returning the
    manifest DataFrame. Mode is overwrite: an export is a derived
    artifact, rerunning it must converge to the same bytes."""
    sharded = _with_shard(df, key_col, n_shards)
    (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, key_col)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .json(path)
    )
    m = manifest(sharded, key_col, n_shards)
    m.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return m


def read_export(spark: SparkSession, path: str) -> DataFrame:
    """Read the landed shards back (shard dir becomes the shard col)."""
    return spark.read.option("basePath", path).json(f"{path}/{SHARD_COL}=*")


def verify_export(spark: SparkSession, path: str, key_col: str) -> DataFrame:
    """Integrity check: recompute (shard, n_rows, content_sig) from
    the LANDED files and anti-compare against the stored manifest.
    Returns the discrepancy frame — empty means every shard landed
    with exactly the advertised rows and content; a non-empty result
    lists (shard, expected vs found) for corrupt, truncated, or
    missing shards. One parallel scan of the export, one broadcast
    join of two manifest-sized tables."""
    stored = spark.read.parquet(f"{path}/_manifest").select(
        SHARD_COL,
        F.col("n_rows").alias("expect_rows"),
        F.col("content_sig").alias("expect_sig"),
    )
    landed = read_export(spark, path)
    # n_shards irrelevant: shard col already present from the path
    found = manifest(landed, key_col, n_shards=-1).select(
        SHARD_COL,
        F.col("n_rows").alias("found_rows"),
        F.col("content_sig").alias("found_sig"),
    )
    return (
        stored.join(found, SHARD_COL, "full_outer")
        .filter(
            (F.col("expect_rows").isNull())
            | (F.col("found_rows").isNull())
            | (F.col("expect_rows") != F.col("found_rows"))
            | (F.col("expect_sig") != F.col("found_sig"))
        )
        .orderBy(SHARD_COL)
    )
