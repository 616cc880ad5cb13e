"""Incremental corpus ingestion with near-dup dedup — the streaming
composition of the §2-D operators: every incoming micro-batch of
documents is checked against a persistent MinHash signature index
before admission, so the corpus stays near-dup-free as it grows
(the shape a production training-data pipeline actually runs; the
batch operators in operators/dedup.py are its full-corpus twins).

Store layout (both plain parquet, Hive-partitioned by the ingest
batch id so replayed micro-batches overwrite their own partition —
the same idempotent-foreachBatch pattern as sources/sink.py):

- ``<store>/bands``: (doc_id, band_idx, band_key) — 16 rows per
  admitted doc. The ONLY thing a new batch joins against: a band-key
  equi-join, selective by construction, never a scan-all-pairs.
- ``<store>/sigs``: (doc_id, sig: array<bigint>[64]) — one row per
  admitted doc, fetched only for band-join candidates to estimate
  similarity.

Dedup rule per new doc (deterministic):
- dropped if a band match against the STORE has estimated Jaccard
  >= threshold (fraction of agreeing minhash components — the
  standard unbiased estimator; at 64 permutations the estimate's
  std dev at the 0.8 threshold is ~0.05);
- dropped if a band match against a SMALLER-id doc of the same batch
  estimates >= threshold (keep-lowest within the batch, one hop —
  the transitive closure over history is exactly what the running
  store provides: a dropped doc's survivor twin is already indexed).

At 100 TB: the per-batch cost is O(batch shingles) signature math +
one band equi-join against the index + a candidate-only sig fetch;
the full corpus is never rescanned. Band/permutation parameters are
shared with operators/dedup.py (imported, can't drift).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    BAND_ROWS,
    N_PERM,
    _shingles_exploded,
    minhash_signatures,
)

SIG_SIM_THRESHOLD = 0.8

_SIG_SCHEMA = "doc_id bigint, sig array<bigint>"
_BAND_SCHEMA = "doc_id bigint, band_idx int, band_key int"


def sig_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, sig, ...) → (doc_id, band_idx, band_key): the same
    16×4 banding as the batch LSH operators (same F.hash over the
    same slices — imported constants keep parameters in lockstep)."""
    n_bands = N_PERM // BAND_ROWS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.hash(F.slice("sig", j * BAND_ROWS + 1, BAND_ROWS)).alias("band_key"),
            )
            for j in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_key"
    )


def _estimated_sim(a: str, b: str):
    """Fraction of agreeing minhash components between two sig arrays
    — codegen higher-order expression, evaluated on the (small)
    candidate pair set only, never the corpus."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    ) / F.lit(N_PERM)


def _read_or_empty(
    spark: SparkSession, path: str, schema: str, exclude_batch: int | None = None
) -> DataFrame:
    if os.path.isdir(path):
        from pyspark.errors import AnalysisException

        try:
            df = spark.read.option("basePath", path).parquet(path)
            df.schema  # force schema inference now, inside the try
        except AnalysisException:
            # the dir exists but holds no data files (a crash between
            # partition deletes/writes) — an empty store, not an error
            return spark.createDataFrame([], schema)
        if exclude_batch is not None:
            # a REPLAYED micro-batch must not see its own first
            # attempt's partial store writes: every doc would
            # self-match at sim 1.0 and the whole batch would be
            # dropped. Excluding the batch's own partition makes
            # replay correct by construction in every crash window
            # (before this, it survived only because an empty dynamic
            # overwrite happens to leave old partitions in place).
            df = df.filter(F.col("ingest_batch") != exclude_batch)
        # drop the partition column — consumers key on doc_id only
        return df.select(*[f.split(" ")[0] for f in schema.split(", ")])
    return spark.createDataFrame([], schema)


def dedup_ingest_batch(
    batch: DataFrame, batch_id: int, store_dir: str, survivors_dir: str
) -> None:
    """foreachBatch body: admit the batch's non-near-dup docs, index
    their signatures. Separated from the query wiring so tests (and a
    batch backfill) can drive it directly."""
    spark = batch.sparkSession
    docs = batch.select("doc_id", "text").persist()
    try:
        sig = minhash_signatures(_shingles_exploded(docs)).persist()
        try:
            bands = sig_bands(sig)
            stored_bands = _read_or_empty(
                spark, os.path.join(store_dir, "bands"), _BAND_SCHEMA, exclude_batch=batch_id
            )
            stored_sigs = _read_or_empty(
                spark, os.path.join(store_dir, "sigs"), _SIG_SCHEMA, exclude_batch=batch_id
            )

            # candidates vs the store: band equi-join, then sig fetch
            cand_old = (
                bands.join(
                    stored_bands.select(
                        F.col("doc_id").alias("old_id"), "band_idx", "band_key"
                    ),
                    ["band_idx", "band_key"],
                )
                .select("doc_id", "old_id")
                .distinct()
                .join(sig.select("doc_id", F.col("sig").alias("new_sig")), "doc_id")
                .join(
                    stored_sigs.select(F.col("doc_id").alias("old_id"), F.col("sig").alias("old_sig")),
                    "old_id",
                )
            )
            dropped_vs_store = cand_old.filter(
                _estimated_sim("new_sig", "old_sig") >= SIG_SIM_THRESHOLD
            ).select("doc_id")

            # candidates within the batch: keep the lowest id
            ba = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
            bb = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
            cand_new = (
                ba.join(bb, ["band_idx", "band_key"])
                .filter(F.col("doc_a") < F.col("doc_b"))
                .select("doc_a", "doc_b")
                .distinct()
                .join(sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a")
                .join(sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
            )
            dropped_in_batch = cand_new.filter(
                _estimated_sim("sig_a", "sig_b") >= SIG_SIM_THRESHOLD
            ).select(F.col("doc_b").alias("doc_id"))

            # the dropped set derives FROM docs, so a bare
            # join(..., "doc_id", "left_anti") is a self-join whose
            # two doc_id sides carry the same attribute id — the
            # condition degenerates and the anti-join drops everything
            # whenever any doc is dropped. Rename the right side to a
            # fresh attribute and join on an explicit condition.
            dropped = (
                dropped_vs_store.unionByName(dropped_in_batch)
                .distinct()
                .select(F.col("doc_id").alias("dropped_id"))
            )
            survivors = docs.join(
                dropped, docs["doc_id"] == dropped["dropped_id"], "left_anti"
            )

            def _append(df: DataFrame, path: str) -> None:
                (
                    df.withColumn("ingest_batch", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("ingest_batch")
                    .parquet(path)
                )

            # ORDER MATTERS: the survivors plan reads the band/sig
            # store (via `dropped`), and the store writes below mutate
            # it — an evaluation of `survivors` after those writes
            # would see each admitted doc's OWN fresh index entry,
            # self-match at sim 1.0, and drop everything. Write the
            # survivors first (the one evaluation, against the
            # pre-batch store), then index from a RE-READ of the
            # written partition: its lineage is a file scan, immune to
            # both the store mutation and cache eviction.
            _append(survivors, survivors_dir)
            written = (
                spark.read.option("basePath", survivors_dir)
                .parquet(survivors_dir)
                .filter(F.col("ingest_batch") == batch_id)
                .select("doc_id")
            )
            surviving_sigs = sig.join(written, "doc_id", "left_semi")
            _append(surviving_sigs.select("doc_id", "sig"), os.path.join(store_dir, "sigs"))
            _append(sig_bands(surviving_sigs), os.path.join(store_dir, "bands"))
        finally:
            sig.unpersist()
    finally:
        docs.unpersist()


def start_dedup_ingest(
    docs_stream: DataFrame,
    store_dir: str,
    survivors_dir: str,
    checkpoint: str,
) -> StreamingQuery:
    """Wire the incremental dedup into a streaming query. The
    checkpoint + per-batch_id dynamic partition overwrite makes a
    replayed micro-batch rewrite its own store/survivor partitions
    instead of double-admitting (effectively-exactly-once for the
    deterministic batch body, same as sources/sink.write_fact_batch)."""
    return (
        docs_stream.writeStream.foreachBatch(
            lambda df, bid: dedup_ingest_batch(df, bid, store_dir, survivors_dir)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
