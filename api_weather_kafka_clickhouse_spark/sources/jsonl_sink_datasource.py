"""Keyed JSONL sink as a PySpark 4 Python Data Source WRITER.

The reference's egress is a keyed Kafka producer (`Producer_clickhouse.py:45-63`:
message key = city, value = the JSON payload, acks=all) plus a JSON
file archive (`app.py:33`). The spark-sql-kafka jar is absent in this
environment (SURVEY §2-A8), so this module implements the same
contract — keyed, shard-addressed, atomically-committed JSON lines —
through the Python Data Source WRITE path (`DataSource.writer` /
`DataSourceWriter`), completing the API surface the read side
(`weather_datasource.py`) already demonstrates:

- ``write(iterator)`` runs per TASK on executors: rows are streamed
  to one ``part-<partitionId>.jsonl`` file under a per-attempt
  ``_tmp-<uuid>`` staging directory, and the returned
  ``WriterCommitMessage`` carries (shard path, row count, byte size).
- ``commit(messages)`` runs ONCE on the driver after every task
  succeeded: staged files move into the target directory with one
  rename each, and a ``_MANIFEST.json`` (shard -> rows/bytes, total)
  is written LAST — readers treat the manifest as the commit marker,
  so a crash mid-publish is recoverable garbage, never a half-read
  (the same marker-last protocol as streaming/store.py compaction).
- ``abort(messages)`` deletes the staging directory; nothing under
  the target ever becomes visible.

Usage::

    register(spark)
    df.write.format("keyed_jsonl").mode("append")
      .option("path", out_dir).option("key_column", "city").save()

The key column is written first in each JSON object (the Kafka
message-key position); rows should be pre-partitioned by the key
(``df.repartition(n, key)``) for Kafka-like per-key shard locality —
the writer records which shard got which rows in the manifest, so
the keyed-delivery contract is auditable.

Storage requirement: task staging and driver commit address the same
filesystem with atomic rename (local/NFS/HDFS semantics) — the same
contract `streaming/store.py` enforces for compaction; object-store
deployments should commit through their native multipart/manifest
mechanism instead.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "keyed_jsonl"
MANIFEST = "_MANIFEST.json"


class ShardCommit(WriterCommitMessage):
    def __init__(self, shard: str, staged: str, rows: int, n_bytes: int):
        self.shard = shard  # published name (part-<pid>.jsonl)
        self.staged = staged  # per-ATTEMPT staged name (carries attempt id)
        self.rows = rows
        self.n_bytes = n_bytes


class KeyedJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("keyed_jsonl requires .option('path', ...)")
        self.path = path
        self.key_column = options.get("key_column")
        self.overwrite = overwrite
        self.schema = schema
        if self.key_column and self.key_column not in schema.fieldNames():
            raise ValueError(
                f"key_column {self.key_column!r} not in schema {schema.fieldNames()}"
            )
        # one staging dir per write attempt, created up front on the
        # driver so executors only ever create files inside it
        self.staging = os.path.join(path, f"_tmp-{uuid.uuid4().hex}")
        os.makedirs(self.staging, exist_ok=True)

    # ---- executor side ------------------------------------------------
    def write(self, iterator) -> ShardCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        shard = f"part-{pid:05d}.jsonl"
        # stage under an attempt-unique name: a speculative or retried
        # attempt of the same partition must NOT share a file with a
        # concurrent attempt (interleaved/truncated output before
        # commit). commit() renames exactly the attempt whose
        # ShardCommit Spark delivered — the winning one.
        staged = f"part-{pid:05d}-attempt-{ctx.taskAttemptId()}.jsonl"
        tmp = os.path.join(self.staging, staged)
        fields = self.schema.fieldNames()
        # key first: the Kafka message-key position in each object
        if self.key_column:
            fields = [self.key_column] + [f for f in fields if f != self.key_column]
        rows = 0
        with open(tmp, "w", encoding="utf-8") as out:
            for row in iterator:
                d = row.asDict(recursive=True)
                out.write(json.dumps({f: d[f] for f in fields}, default=str))
                out.write("\n")
                rows += 1
        return ShardCommit(shard=shard, staged=staged, rows=rows, n_bytes=os.path.getsize(tmp))

    # ---- driver side --------------------------------------------------
    def commit(self, messages) -> None:
        target = self.path
        if self.overwrite:
            # crash-ordering: invalidate the directory FIRST by
            # removing the old manifest (readers honor
            # manifest-as-commit-marker, so from this point the dir is
            # uncommitted garbage), THEN delete old data files, THEN
            # publish staged shards; the new manifest lands last. A
            # crash at any step leaves either the old committed state
            # (manifest intact, nothing deleted yet) or a
            # marker-less dir readers refuse — never a live manifest
            # over missing/mixed shards.
            old_manifest = os.path.join(target, MANIFEST)
            if os.path.exists(old_manifest):
                os.remove(old_manifest)
            for name in os.listdir(target):
                if name.endswith(".jsonl"):
                    os.remove(os.path.join(target, name))
        shards = {}
        for m in messages:
            os.replace(
                os.path.join(self.staging, m.staged), os.path.join(target, m.shard)
            )
            shards[m.shard] = {"rows": m.rows, "bytes": m.n_bytes}
        # manifest LAST: its existence is the commit marker
        manifest = {
            "shards": shards,
            "total_rows": sum(s["rows"] for s in shards.values()),
            "key_column": self.key_column,
        }
        tmp = os.path.join(self.staging, MANIFEST)
        with open(tmp, "w", encoding="utf-8") as out:
            json.dump(manifest, out, sort_keys=True)
        os.replace(tmp, os.path.join(target, MANIFEST))
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class KeyedJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return KeyedJsonlWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(KeyedJsonlDataSource)


def read_manifest(path: str) -> dict:
    """The reader-side commit check: no manifest => the directory is
    uncommitted garbage and must not be read."""
    with open(os.path.join(path, MANIFEST), encoding="utf-8") as f:
        return json.load(f)
