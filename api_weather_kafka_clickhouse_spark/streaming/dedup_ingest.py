"""Incremental corpus ingestion with near-dup dedup — the streaming
composition of the §2-D operators: every incoming micro-batch of
documents is checked against a persistent MinHash signature index
before admission, so the corpus stays near-dup-free as it grows
(the shape a production training-data pipeline actually runs; the
batch operators in operators/dedup.py are its full-corpus twins).

Store layout (all plain parquet, Hive-partitioned by the ingest
batch id so replayed micro-batches overwrite their own partition —
the same idempotent-foreachBatch pattern as sources/sink.py):

- ``<store>/bands``: (doc_id, band_idx, band_key) — 16 rows per
  admitted shingleable doc. The ONLY thing a new batch joins
  against: a band-key equi-join, selective by construction, never a
  scan-all-pairs.
- ``<store>/sigs``: (doc_id, sig: array<bigint>[64]) — one row per
  admitted shingleable doc, fetched only for band-join candidates to
  estimate similarity.
- ``<store>/shorts``: (doc_id, text_md5) — docs too short to shingle
  (< 3 tokens) can't carry a MinHash signature; they are deduped
  EXACTLY by content hash instead (near-dup on a 2-token doc is
  meaningless, but an unindexed doc would be re-admitted on every
  at-least-once re-delivery — the invariant leak this table closes).

Dedup rule per new doc (deterministic):
- duplicate doc_ids within a batch collapse first (keep the
  lexicographically-smallest text — producer-retry rows would
  otherwise both pass the anti-join, and same-id-different-text rows
  would merge shingle sets into a signature matching neither);
- a shingleable doc is dropped if a band match against the STORE has
  estimated Jaccard >= threshold (fraction of agreeing minhash
  components — the standard unbiased estimator; at 64 permutations
  the estimate's std dev at the 0.8 threshold is ~0.05), or if a
  band match against a SMALLER-id doc of the same batch estimates >=
  threshold (keep-lowest within the batch, one hop — the transitive
  closure over history is what the running store provides);
- a short doc is dropped if its md5 is already stored, or a
  smaller-id doc of the same batch shares it.

Replay correctness: a batch EXCLUDES its own store partitions from
every dedup decision, so a partial first attempt can never
self-match; re-running a batch id recomputes the same admission and
overwrites its own partitions.

At 100 TB: the per-batch cost is O(batch shingles) signature math +
one band equi-join against the index + a candidate-only sig fetch;
the full corpus is never rescanned. Banding comes from
operators.dedup.minhash_bands — the same code, not a copy, so the
streaming index and the batch operators cannot drift. The
one-partition-per-batch store wants periodic compaction at a
quiescent point (SCALE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    N_PERM,
    _shingles_exploded,
    minhash_bands,
    minhash_signatures,
)

SIG_SIM_THRESHOLD = 0.8

_SIG_SCHEMA = "doc_id bigint, sig array<bigint>"
_BAND_SCHEMA = "doc_id bigint, band_idx int, band_key int"
_SHORT_SCHEMA = "doc_id bigint, text_md5 string"


def _estimated_sim(a: str, b: str):
    """Fraction of agreeing minhash components between two sig arrays
    — codegen higher-order expression, evaluated on the (small)
    candidate pair set only, never the corpus."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    ) / F.lit(N_PERM)


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FS API, so hdfs:///s3a://
    stores work identically to local paths (an os.path.isdir gate
    would silently treat every remote store as empty — no dedup, no
    error)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def _read_store(
    spark: SparkSession,
    path: str,
    schema: str,
    exclude_batch: int | None = None,
    only_batch: int | None = None,
) -> DataFrame:
    if _fs_exists(spark, path):
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
        # drop the partition column — consumers key on doc_id only
        return df.select(*[f.split(" ")[0] for f in schema.split(", ")])
    return spark.createDataFrame([], schema)


def dedup_ingest_batch(
    batch: DataFrame, batch_id: int, store_dir: str, survivors_dir: str
) -> None:
    """foreachBatch body: admit the batch's non-near-dup docs, index
    their signatures. Separated from the query wiring so tests (and a
    batch backfill) can drive it directly."""
    from pyspark.sql import Window

    spark = batch.sparkSession

    # collapse duplicate doc_ids deterministically before anything
    # else (see module docstring)
    w = Window.partitionBy("doc_id").orderBy("text")
    docs = (
        batch.select("doc_id", "text", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    try:
        # cap=None: the hot-shingle document-frequency cut is a
        # CORPUS-level statistic; computed per micro-batch it would
        # make the stored signature of a text depend on what else
        # happened to arrive in its batch (a boilerplate shingle
        # crossing the cap in a big backfill batch but not in a small
        # later one), so identical text gets different signatures and
        # near-dups against the store are silently missed below the
        # threshold (round-5 review finding). Streaming signatures
        # must be context-free; the batch twins keep the cap because
        # there the DF estimate really is corpus-wide.
        sig = minhash_signatures(_shingles_exploded(docs, cap=None)).persist()
        try:
            bands = minhash_bands(sig)
            stored_bands = _read_store(
                spark, os.path.join(store_dir, "bands"), _BAND_SCHEMA, exclude_batch=batch_id
            )
            stored_sigs = _read_store(
                spark, os.path.join(store_dir, "sigs"), _SIG_SCHEMA, exclude_batch=batch_id
            )
            stored_shorts = _read_store(
                spark, os.path.join(store_dir, "shorts"), _SHORT_SCHEMA, exclude_batch=batch_id
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

            # docs too short to shingle: exact md5 dedup vs the shorts
            # store and within the batch (keep-lowest id per digest)
            shorts = (
                docs.join(sig.select("doc_id"), "doc_id", "left_anti")
                .select("doc_id", F.md5("text").alias("text_md5"))
                .persist()
            )
            try:
                dropped_short_vs_store = shorts.join(
                    stored_shorts.select(F.col("text_md5").alias("old_md5")),
                    shorts["text_md5"] == F.col("old_md5"),
                    "left_semi",
                ).select("doc_id")
                sw = Window.partitionBy("text_md5").orderBy("doc_id")
                dropped_short_in_batch = (
                    shorts.select("doc_id", "text_md5", F.row_number().over(sw).alias("_rn"))
                    .filter(F.col("_rn") > 1)
                    .select("doc_id")
                )

                dropped = (
                    dropped_vs_store.unionByName(dropped_in_batch)
                    .unionByName(dropped_short_vs_store)
                    .unionByName(dropped_short_in_batch)
                    .distinct()
                    .select(F.col("doc_id").alias("dropped_id"))
                )
                # the dropped set derives FROM docs: a bare
                # join(..., "doc_id", "left_anti") would be a self-join
                # whose two doc_id sides carry the same attribute id —
                # the condition degenerates and drops everything. Join
                # on an explicitly renamed right side.
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

                # ORDER MATTERS: the survivors plan reads the store
                # (via `dropped`), and the store writes below mutate
                # it — an evaluation of `survivors` after those writes
                # would see each admitted doc's OWN fresh index entry,
                # self-match at sim 1.0, and drop everything. Write
                # the survivors first (the one evaluation, against the
                # pre-batch store), then index from a RE-READ of the
                # written files: their lineage is a file scan, immune
                # to both the store mutation and cache eviction.
                _append(survivors, survivors_dir)
                # only THIS batch's partition: a re-delivered doc_id
                # surviving in an older partition must not cause the
                # current (dropped) copy to be re-indexed
                written = _read_store(
                    spark,
                    survivors_dir,
                    "doc_id bigint, text string",
                    only_batch=batch_id,
                ).select("doc_id")
                surviving_sigs = sig.join(written, "doc_id", "left_semi")
                _append(surviving_sigs.select("doc_id", "sig"), os.path.join(store_dir, "sigs"))
                _append(minhash_bands(surviving_sigs), os.path.join(store_dir, "bands"))
                _append(
                    shorts.join(written, "doc_id", "left_semi"),
                    os.path.join(store_dir, "shorts"),
                )
            finally:
                shorts.unpersist()
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


COMPACTED_BATCH_ID = -1


def compact_store(spark: SparkSession, store_dir: str) -> int:
    """Fold every store table's one-partition-per-batch history into a
    single ``ingest_batch=-1`` partition; returns how many tables were
    rewritten. A long-running deployment accumulates one (tiny)
    partition dir per micro-batch — directory listings, not data
    size, eventually dominate the per-batch store read.

    MUST run at a QUIESCENT point: no in-flight batch, no pending
    replay (the swap below briefly moves the table aside, and a
    concurrent batch reading a missing store would dedup against
    nothing). A replay arriving AFTER compaction degrades safely: the
    replayed batch's docs are already in the compacted partition, so
    every doc self-matches, the batch admits nothing, and its
    (empty) partition writes change no data — the admitted corpus
    and index are unchanged.

    Crash safety: the swap is rename-aside → rename-tmp-in →
    delete-aside, so at every instant at least one COMPLETE copy of
    the table exists under the live path, ``__compact_tmp``, or
    ``__compact_old``; on entry any dangling state from a previous
    crash is recovered first (tmp renamed into a missing live path,
    a leftover aside copy deleted once the live path is complete).
    Rerunning compaction after a crash at ANY step therefore
    converges with the index intact. The round-5 delete-old-then-
    rename ordering instead had a window where the table existed
    only in ``__compact_tmp`` and a rerun's existence check skipped
    it — every later batch then read an EMPTY store and silently
    re-admitted near-dups of the entire history.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    rewritten = 0
    for sub, schema in (
        ("sigs", _SIG_SCHEMA),
        ("bands", _BAND_SCHEMA),
        ("shorts", _SHORT_SCHEMA),
    ):
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
                raise IOError(f"compact_store recovery: rename {tmp} -> {path} failed")
        # crash before delete-aside (live is complete) — or, with the
        # branch above, the aside left from a rename-in crash
        if fs.exists(p_aside) and fs.exists(p_live):
            fs.delete(p_aside, True)
        # a stale tmp beside a complete live table (crash between the
        # tmp write and rename-aside) is simply overwritten below

        if not _fs_exists(spark, path):
            continue
        df = _read_store(spark, path, schema)
        (
            df.withColumn("ingest_batch", F.lit(COMPACTED_BATCH_ID))
            .write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(tmp)
        )
        # -- the swap; rename returns FALSE on failure (no throw) --
        if not fs.rename(p_live, p_aside):
            raise IOError(f"compact_store: rename {path} -> {aside} failed")
        if not fs.rename(p_tmp, p_live):
            # put the old table back so the store is never left missing
            fs.rename(p_aside, p_live)
            raise IOError(f"compact_store: rename {tmp} -> {path} failed")
        fs.delete(p_aside, True)
        rewritten += 1
    return rewritten
