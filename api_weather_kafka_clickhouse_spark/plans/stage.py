"""Stage materialization for multi-consumer intermediates.

Operators whose plan fans an intermediate out to several consumers
(the LSH shingle table feeds signatures AND both sides of the verify
join) need it computed exactly once. Two standard options:

- ``.persist()`` — fast, but the cache outlives the operator call:
  the returned DataFrame is lazy, so there is no safe point inside
  the operator to unpersist, and a long-lived session accumulates
  executor memory (round-2 verdict, "operator-scope persist leaks").
- **storage checkpoint** (this module) — write the stage to scratch
  columnar files once, eagerly, and hand every consumer a clean
  re-read. Nothing stays in the block-manager cache and lineage is
  truncated (no recompute storms on executor loss).

The scratch root defaults to a driver-local temp dir (right for
``local[N]``, removed at process exit). On a real cluster set
``SPARK_GRAFT_SCRATCH_DIR`` to a shared scratch prefix (HDFS/S3) that
every executor can reach — a driver-local path would scatter task
output across executor-local filesystems and the re-read would see a
partial dataset. Dirs under an env-provided root are NOT removed at
exit (the cluster's scratch-retention policy owns them); per-call
cleanup is available via ``scoped_checkpoint``.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid
from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame

_STAGE_ROOT: str | None = None


def _root() -> str:
    global _STAGE_ROOT
    if _STAGE_ROOT is None:
        env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
        if env:
            _STAGE_ROOT = env
        else:
            _STAGE_ROOT = tempfile.mkdtemp(prefix="spark_graft_stage_")
            atexit.register(shutil.rmtree, _STAGE_ROOT, ignore_errors=True)
    return _STAGE_ROOT


def _materialize(df: DataFrame, name: str) -> tuple[str, DataFrame]:
    """Write ``df`` to a fresh scratch dir; return (path, re-read)."""
    path = os.path.join(_root(), f"{name}_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(path)
    return path, df.sparkSession.read.parquet(path)


def _remove(df: DataFrame, path: str) -> None:
    """Delete a checkpoint dir via the Hadoop FS API (works for any
    scheme the session can write, not just local POSIX)."""
    spark = df.sparkSession
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)


def stage_checkpoint(df: DataFrame, name: str = "stage") -> DataFrame:
    """Materialize ``df`` once to scratch parquet; return the re-read.

    Eager: the write runs now, so the cost lands inside the operator's
    own timing, and every downstream consumer scans columnar files
    instead of recomputing the stage or pinning executor memory.
    The files live until process exit (local tmp root) or until the
    cluster scratch policy reclaims them (env-provided root); callers
    with a bounded consumption scope should prefer ``scoped_checkpoint``.
    """
    return _materialize(df, name)[1]


@contextmanager
def scoped_checkpoint(df: DataFrame, name: str = "stage") -> Iterator[DataFrame]:
    """``stage_checkpoint`` whose files are deleted when the block
    exits — for callers that finish consuming the stage inside a known
    scope (e.g. one polling cycle). Without the delete, a
    run-forever loop would accumulate one full checkpoint per cycle
    until the scratch volume fills.
    """
    path, out = _materialize(df, name)
    try:
        yield out
    finally:
        _remove(df, path)


def eager_release(result: DataFrame, name: str, *cached: DataFrame) -> DataFrame:
    """Run ``result`` NOW against in-memory ``cached`` intermediates,
    then drop the caches.

    The persist-leak-free twin of plain ``.persist()`` fan-out: the
    operator persists its multi-consumer intermediates (memory speed,
    no scratch IO for the big tables), computes its — typically small —
    final result once to scratch parquet, and unpersists everything
    before returning. The caller gets a clean re-read whose lineage is
    just a file scan; nothing stays in the block-manager cache after
    the call (the round-2 leak), and the big intermediates were never
    written to disk at all (the cost stage_checkpoint pays).

    The unpersist runs even when the eager write throws — an exception
    path that left the caches registered would reintroduce the exact
    leak this module exists to prevent.
    """
    try:
        out = stage_checkpoint(result, name)
    finally:
        for df in cached:
            df.unpersist()
    return out
