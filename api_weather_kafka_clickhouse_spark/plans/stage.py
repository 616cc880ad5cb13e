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
  re-read. Nothing stays in the block-manager cache, lineage is
  truncated (no recompute storms on executor loss), and at cluster
  scale the same call writes the job's scratch HDFS/S3 prefix — the
  shape a 100 TB pipeline uses for its shingle/signature indexes
  anyway.

The scratch root is one session-scoped temp dir, removed at process
exit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

_STAGE_ROOT: str | None = None


def _root() -> str:
    global _STAGE_ROOT
    if _STAGE_ROOT is None:
        _STAGE_ROOT = tempfile.mkdtemp(prefix="spark_graft_stage_")
        atexit.register(shutil.rmtree, _STAGE_ROOT, ignore_errors=True)
    return _STAGE_ROOT


def stage_checkpoint(df: DataFrame, name: str = "stage") -> DataFrame:
    """Materialize ``df`` once to scratch parquet; return the re-read.

    Eager: the write runs now, so the cost lands inside the operator's
    own timing, and every downstream consumer scans columnar files
    instead of recomputing the stage or pinning executor memory.
    """
    path = os.path.join(_root(), f"{name}_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


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
    """
    out = stage_checkpoint(result, name)
    for df in cached:
        df.unpersist()
    return out
