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

# Written inside a compaction's __compact_tmp dir AFTER the parquet
# job completes; its presence is what recovery trusts to distinguish
# a complete tmp copy from a partial one. Underscore-prefixed, so
# parquet scans of the table ignore it once tmp is renamed live.
COMPACT_MARKER = "_COMPACT_DONE"

# One scheme-identifier file per store ("_scheme"): stored artifacts
# (signatures, band keys) are only comparable to new ones computed by
# the SAME code parameters. A silent parameter change (e.g. the
# round-5 capped->uncapped signing fix) would otherwise depress every
# cross-boundary similarity estimate and re-admit near-dups with no
# error; opening a store whose scheme differs must fail LOUD instead.
SCHEME_FILE = "_scheme"


# Filesystem schemes whose directory "rename" is client-side
# copy+delete, not an atomic metadata operation. compact_tables'
# crash-safety proof depends on steps 3-4 being atomic, so it refuses
# these outright (see _require_atomic_rename).
NONATOMIC_RENAME_SCHEMES = frozenset({"s3", "s3a", "s3n", "gs", "oss", "cos", "swift", "wasb", "wasbs"})


def _fs_scheme(fs, path) -> str:  # noqa: ANN001 (JVM objects)
    """The filesystem scheme ('file', 'hdfs', 's3a', ...) a path
    resolves to. Separated out so tests can simulate an object store
    without one."""
    scheme = fs.getUri().getScheme()
    return (scheme or "file").lower()


def _require_atomic_rename(fs, path: str) -> None:  # noqa: ANN001
    """Refuse to compact on a filesystem whose rename is copy+delete.

    The swap protocol keeps one complete table copy at every instant
    ONLY under atomic directory rename (POSIX, HDFS, ABFS): on S3A-
    style stores a crash mid-rename interleaves two partial copies
    file-by-file, which recovery cannot distinguish after the fact.
    A silent best-effort here would risk the exact empty-store/
    re-admit-history failure the protocol exists to prevent, so the
    guard is in code, not prose. Object-store deployments should skip
    in-place compaction and rebuild from replay instead.
    """
    scheme = _fs_scheme(fs, path)
    if scheme in NONATOMIC_RENAME_SCHEMES:
        raise RuntimeError(
            f"compact_tables refused: {path} resolves to scheme {scheme!r}, "
            "whose directory rename is copy+delete (non-atomic); a crash "
            "mid-swap could leave two interleaved partial copies that "
            "recovery cannot tell apart. Run compaction on an atomic-rename "
            "filesystem (POSIX/HDFS/ABFS), or skip in-place compaction and "
            "rebuild the store from replay for object-store deployments."
        )


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FS API, so hdfs:///s3a://
    stores work identically to local paths (an os.path.isdir gate
    would silently treat every remote store as empty — no dedup, no
    error)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def read_small_text(spark: SparkSession, path: str) -> str | None:
    """Driver-side read of a SMALL text file (or a directory of text
    part files) through the Hadoop FS API — no Spark job. For
    marker/metadata files only: launching a full job per micro-batch
    to re-read ~50 bytes is measurable scheduling overhead. Returns
    None when the path does not exist; concatenates part files in
    name order (the layout spark.write.text produces)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return None
    if fs.getFileStatus(p).isDirectory():
        statuses = sorted(
            (s for s in fs.listStatus(p) if s.isFile()),
            key=lambda s: s.getPath().getName(),
        )
        files = [
            s.getPath()
            for s in statuses
            if not s.getPath().getName().startswith(("_", "."))
        ]
    else:
        files = [p]
    out = []
    for f in files:
        stream = fs.open(f)
        try:
            out.append(jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8"))
        finally:
            stream.close()
    return "".join(out)


def write_small_text(spark: SparkSession, path: str, content: str) -> None:
    """Driver-side write of a SMALL text file through the Hadoop FS
    API — no Spark job. The write-side twin of ``read_small_text``,
    for the marker/metadata files (scheme, run id, high-water): a
    ``createDataFrame().coalesce(1).write.text`` of ~50 bytes costs a
    full job submission per call, which the per-batch markers pay on
    every micro-batch. Writes a plain file (overwriting), which
    ``read_small_text`` reads via its single-file branch; stores
    written by the old directory-style writer remain readable.

    Crash atomicity (round-16, round-15 ADVICE): the content is
    written to a ``<path>.__tmp`` sibling and renamed over the target
    — atomic on the POSIX/HDFS/ABFS filesystems the store layer's
    compaction protocol already requires. A bare ``fs.create(p,
    True)`` truncates in place, so a crash mid-write left an EMPTY
    marker: an empty high-water marker reads back as None in
    ``read_high_water``, silently disabling
    ``guard_replay_after_compaction``'s double-count refusal."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".__tmp")
    fs = p.getFileSystem(conf)
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
    # an old-layout marker is a DIRECTORY of part files at this path;
    # rename cannot replace a directory, so clear it first (the window
    # between delete and rename can lose the OLD value on a crash, but
    # never leaves a truncated/empty file — the failure read_high_water
    # cannot distinguish from "no marker yet")
    if fs.exists(p):
        fs.delete(p, True)
    if not fs.rename(tmp, p):
        raise IOError(f"write_small_text: rename {path}.__tmp -> {path} failed")


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
    spark: SparkSession,
    store_dir: str,
    tables: tuple[tuple[str, str], ...],
    transform=None,
) -> int:
    """Fold each table's one-partition-per-batch history into a single
    ``ingest_batch=-1`` partition; returns how many tables were
    rewritten. ``transform`` (optional, df -> df, schema-preserving)
    is applied to each table's merged rows before the rewrite — the
    hook summing/aggregating stores use to MERGE rows during
    compaction (rollup_store) instead of carrying them verbatim; it
    shares this function's crash protocol instead of duplicating it.

    MUST run at a QUIESCENT point: no in-flight batch, no pending
    replay (the swap below briefly moves the table aside, and a
    concurrent batch reading a missing store would dedup against
    nothing). A replay arriving AFTER compaction degrades safely: the
    replayed batch's rows are already in the compacted partition, so
    every row self-matches, the batch admits nothing, and its (empty)
    partition writes change no data.

    Crash safety protocol (per table):

    1. write the compacted copy to ``__compact_tmp``
    2. create the ``_COMPACT_DONE`` marker INSIDE tmp — recovery
       trusts a tmp copy only when the marker proves the parquet job
       finished
    3. rename live → ``__compact_old`` (aside)
    4. rename tmp → live
    5. delete aside (and the marker that travelled into live)

    so at every instant at least one COMPLETE copy of the table
    exists, and on entry any dangling state from a previous crash is
    recovered first: a marker-trusted tmp is renamed into place, an
    untrusted tmp remnant is discarded in favor of the live/aside
    copy (or renamed in as a last resort when it is the only remnant
    — the legacy pre-marker layout), and a leftover aside is deleted
    once live is complete or restored when live is missing.
    Rerunning compaction after a crash at ANY step therefore
    converges with the index intact. A delete-old-then-rename
    ordering instead has a window where the table exists only in
    ``__compact_tmp`` and a rerun's existence check skips it — every
    later batch then reads an EMPTY store and silently re-admits
    near-dups of the entire history (the round-5 review finding this
    protocol exists to prevent).

    Filesystem requirements: steps 3-4 assume ATOMIC directory rename
    (POSIX, HDFS, ABFS). On an object store whose rename is
    copy+delete (S3A), a crash mid-step-3 leaves partial copies under
    BOTH live and aside — the marker lets recovery prefer the
    complete tmp copy there, but a crash mid-step-4 interleaves tmp
    and live file-by-file and is NOT distinguishable after the fact.
    The requirement is ENFORCED, not advisory: _require_atomic_rename
    raises on known copy+delete schemes before any table is touched;
    object-store deployments should rebuild from replay instead.
    """
    rewritten = 0
    for sub, schema in tables:
        path = os.path.join(store_dir, sub)

        def _write_compacted(tmp: str, _path: str = path, _schema: str = schema) -> None:
            df = read_store(spark, _path, _schema)
            if transform is not None:
                df = transform(df)
            (
                df.withColumn("ingest_batch", F.lit(COMPACTED_BATCH_ID))
                .write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(tmp)
            )

        if crash_safe_rewrite(spark, path, _write_compacted):
            rewritten += 1
    return rewritten


def crash_safe_rewrite(spark: SparkSession, path: str, write_tmp) -> bool:
    """Rewrite the directory at ``path`` in place via the
    tmp → marker → aside → swap protocol whose steps, recovery cases,
    and filesystem requirements are documented (and proven) in the
    compact_tables docstring above. compact_tables delegates here;
    sources/sink.optimize_fact shares the same protocol for warehouse
    partition rewrites instead of duplicating it.

    ``write_tmp(tmp_path)`` must produce the COMPLETE rewritten copy
    at ``tmp_path`` before returning. Returns True when a rewrite
    happened, False when ``path`` does not exist (after recovery of
    any previous interrupted rewrite of the same path, so
    re-invocation always converges)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    tmp = path + "__compact_tmp"
    aside = path + "__compact_old"
    p_live = jvm.org.apache.hadoop.fs.Path(path)
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_aside = jvm.org.apache.hadoop.fs.Path(aside)
    p_tmp_marker = jvm.org.apache.hadoop.fs.Path(os.path.join(tmp, COMPACT_MARKER))
    p_live_marker = jvm.org.apache.hadoop.fs.Path(os.path.join(path, COMPACT_MARKER))
    fs = p_live.getFileSystem(conf)
    _require_atomic_rename(fs, path)

    # -- recovery of a previous crashed run (protocol above) --
    if fs.exists(p_tmp):
        if fs.exists(p_tmp_marker):  # tmp provably complete
            if fs.exists(p_live) and fs.exists(p_aside):
                # only reachable when rename is non-atomic and the
                # crash hit mid-step-3: live and aside are both
                # partial remnants; tmp is the one complete copy
                fs.delete(p_live, True)
                if not fs.rename(p_tmp, p_live):
                    raise IOError(f"compact recovery: rename {tmp} -> {path} failed")
                fs.delete(p_aside, True)
            elif not fs.exists(p_live):
                # crash between steps 3 and 4
                if not fs.rename(p_tmp, p_live):
                    raise IOError(f"compact recovery: rename {tmp} -> {path} failed")
                if fs.exists(p_aside):
                    fs.delete(p_aside, True)
            else:
                # live complete, crash between steps 2 and 3 —
                # discard tmp and recompact freshly below
                fs.delete(p_tmp, True)
        else:  # tmp without marker: a partial write, UNLESS it is
            # the only remnant (legacy pre-marker writer)
            if fs.exists(p_live):
                fs.delete(p_tmp, True)
            elif fs.exists(p_aside):
                fs.delete(p_tmp, True)
                if not fs.rename(p_aside, p_live):
                    raise IOError(f"compact recovery: rename {aside} -> {path} failed")
            else:
                if not fs.rename(p_tmp, p_live):
                    raise IOError(f"compact recovery: rename {tmp} -> {path} failed")
    elif fs.exists(p_aside):
        if fs.exists(p_live):
            # crash between steps 4 and 5
            fs.delete(p_aside, True)
        else:
            # defensive: a failed step-4 rename-back window
            if not fs.rename(p_aside, p_live):
                raise IOError(f"compact recovery: rename {aside} -> {path} failed")

    if not fs_exists(spark, path):
        return False
    write_tmp(tmp)
    fs.create(p_tmp_marker, True).close()  # step 2: tmp is complete
    # -- the swap; rename returns FALSE on failure (no throw) --
    if not fs.rename(p_live, p_aside):
        raise IOError(f"compact: rename {path} -> {aside} failed")
    if not fs.rename(p_tmp, p_live):
        # put the old table back so the store is never left missing
        fs.rename(p_aside, p_live)
        raise IOError(f"compact: rename {tmp} -> {path} failed")
    fs.delete(p_aside, True)
    fs.delete(p_live_marker, False)  # housekeeping: marker travelled in
    return True


def ensure_store_scheme(
    spark: SparkSession, store_dir: str, scheme: str, tables: tuple[str, ...]
) -> None:
    """Fail LOUD when a store was written under different algorithm
    parameters than the current code's.

    ``scheme`` is a string identifying every parameter that makes
    stored artifacts comparable to freshly-computed ones (permutation
    count, banding shape, shingle policy, similarity kind...). A new
    store records it in ``<store>/_scheme``; reopening checks it. A
    mismatch — or a store holding data from before scheme versioning
    existed — raises instead of silently admitting near-dups across
    the parameter boundary (estimates between differently-computed
    artifacts are biased low; the round-6 review's capped→uncapped
    signing boundary is the motivating case). Recovery is a rebuild:
    re-ingest the corpus (survivor files remain readable) into a
    fresh store directory.
    """
    path = os.path.join(store_dir, SCHEME_FILE)
    # driver-side Hadoop FS read (read_small_text), not
    # spark.read.text().collect(): the record is ~50 bytes and this
    # guard runs on EVERY micro-batch of every ingest store — a full
    # Spark job per batch just to re-read it was measurable fixed
    # control-plane cost in the r14 backfill benches (guide §1/§5:
    # the driver should do almost no data work, and tiny metadata
    # reads are driver work, not cluster work).
    found_txt = read_small_text(spark, path)
    if found_txt is not None:
        found = found_txt.strip()
        if found != scheme:
            raise RuntimeError(
                f"store {store_dir} was written with scheme {found!r} but the "
                f"current code computes {scheme!r}; similarity estimates across "
                "the boundary are invalid — rebuild the store by re-ingesting "
                "into a fresh directory"
            )
        return
    if any(fs_exists(spark, os.path.join(store_dir, t)) for t in tables):
        raise RuntimeError(
            f"store {store_dir} holds data but no {SCHEME_FILE} record (written "
            "before scheme versioning); its artifacts cannot be assumed "
            f"compatible with the current scheme {scheme!r} — rebuild the store "
            "by re-ingesting into a fresh directory"
        )
    write_small_text(spark, path, scheme)


# Stream-run identity marker ("_stream_run"): foreachBatch batch ids
# are only monotone WITHIN one checkpoint lineage. If the checkpoint
# is deleted/recreated while a store directory is kept, ids restart at
# 0 — replay guards silently no-op new batches (the centroid store's
# round-6 finding) and per-batch dynamic partition overwrites silently
# REPLACE the old run's early partitions (the ingest stores' version
# of the same bug). Every streaming wiring (centroid, dedup,
# embedding, segment, and the composed curation pipeline) therefore
# records the query id (stable across restarts of one checkpoint,
# fresh on a recreated one) and refuses LOUD when a different run
# drives an existing store: store_dir and checkpoint must live and
# die together.
RUN_FILE = "_stream_run"


def checkpoint_run_id(spark: SparkSession, checkpoint: str) -> str | None:
    """The streaming query id from ``<checkpoint>/metadata`` — written
    by Spark at stream start, stable across restarts of the SAME
    checkpoint, fresh when the checkpoint is recreated. One
    driver-side Hadoop FS read, no Spark job (and deliberately no
    process-level cache — a cache would mask a checkpoint recreated
    mid-process)."""
    import json

    text = read_small_text(spark, os.path.join(checkpoint, "metadata"))
    if text is None:
        return None
    return str(json.loads(text)["id"])


def verify_stream_run(
    spark: SparkSession, store_dir: str, run_id: str | None, has_state: bool
) -> None:
    """Distinguish foreachBatch REPLAY (same run) from checkpoint
    RESET (different run) before any batch-id/partition logic runs.
    ``None`` (direct batch-API callers, no stream identity) keeps
    legacy behavior. See RUN_FILE."""
    if run_id is None:
        return
    path = os.path.join(store_dir, RUN_FILE)
    found = read_small_text(spark, path)
    found = found.strip() if found is not None else None
    if found == run_id:
        return
    if found:
        # a non-empty marker from a DIFFERENT run; an EMPTY marker
        # (crash during the cold-start marker write, before any state
        # existed) is indistinguishable from absent and falls through
        # to the rewrite below instead of wedging the stream forever
        raise RuntimeError(
            f"store {store_dir} was written by stream run {found!r} but this "
            f"batch comes from run {run_id!r}: the checkpoint was "
            "reset/recreated while the store was kept, so restarted batch ids "
            "would silently no-op replay guards and overwrite the old run's "
            "partitions. store_dir and checkpoint must live and die together "
            "— restore the original checkpoint or rebuild the store in a "
            "fresh directory."
        )
    if has_state:
        raise RuntimeError(
            f"store {store_dir} holds state but no {RUN_FILE} record; it was "
            "not written by this stream (direct batch calls or a "
            "pre-run-marker writer), so its batch ids cannot be compared to "
            "this run's — rebuild the store in a fresh directory or drive it "
            "with the batch API."
        )
    write_small_text(spark, path, run_id)


def verify_scheme_store_run(spark: SparkSession, store_dir: str, run_id: str | None) -> None:
    """verify_stream_run for the scheme-versioned ingest stores
    (dedup/embedding/segment and the curation chain): ``has_state``
    derives from the SCHEME_FILE record, which every such store writes
    on first touch — so a store built by direct batch calls (no run
    marker, scheme present) driven later by a stream refuses, exactly
    like the centroid store's explicit-state variant. Must run BEFORE
    ensure_store_scheme writes the record for a cold store."""
    verify_stream_run(
        spark,
        store_dir,
        run_id,
        has_state=fs_exists(spark, os.path.join(store_dir, SCHEME_FILE)),
    )


# --- high-water replay guard ----------------------------------------

MAX_BATCH_MARKER = "_MAX_BATCH"


def read_high_water(spark: SparkSession, store_dir: str) -> int | None:
    """Highest batch id ever written to this store (None before the
    first batch). Driver-side marker read, no Spark job."""
    txt = read_small_text(spark, os.path.join(store_dir, MAX_BATCH_MARKER))
    return int(txt.strip()) if txt and txt.strip() else None


def write_high_water(spark: SparkSession, store_dir: str, batch_id: int) -> None:
    write_small_text(spark, os.path.join(store_dir, MAX_BATCH_MARKER), str(batch_id))


def guard_replay_after_compaction(
    spark: SparkSession, store_dir: str, table: str, batch_id: int, store_kind: str
) -> None:
    """Refuse the one replay case delta stores cannot make idempotent:
    a batch id at or below the high-water marker whose own partition
    no longer exists must have been folded into a compacted part, so
    rewriting it would double-count rows already inside the fold.
    (A replay whose partition still exists is safe — the dynamic
    partition overwrite replaces it.) Shared by every partial-state
    delta store (SummingMergeTree rollup, AggregatingMergeTree
    states) so the refusal logic exists once."""
    high = read_high_water(spark, store_dir)
    if high is not None and batch_id <= high:
        own = os.path.join(store_dir, table, f"ingest_batch={batch_id}")
        if not fs_exists(spark, own):
            raise RuntimeError(
                f"{store_kind} store {store_dir}: batch {batch_id} replayed after "
                f"its partition was compacted away (high-water {high}); rewriting "
                "it would double-count rows already folded into the compacted "
                "part. Compaction must only run at a quiescent point with the "
                "checkpoint intact — rebuild the store or restore the checkpoint."
            )
