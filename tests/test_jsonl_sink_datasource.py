"""Python Data Source WRITER tests: the keyed JSONL sink's task-write
/ driver-commit / abort protocol, manifest-as-commit-marker, key-first
field order, and read-back equality."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.sources import jsonl_sink_datasource as sink
from api_weather_kafka_clickhouse_spark.tables import load


@pytest.fixture(autouse=True)
def _register(spark):
    sink.register(spark)


def _write(spark, sf_dir, out, mode="append", key="event_type", parts=4):
    df = (
        load(spark, "events", sf_dir)
        .select("event_id", "event_type", "user_id", "value")
        .repartition(parts, "event_type")
    )
    w = df.write.format(sink.FORMAT_NAME).mode(mode).option("path", str(out))
    if key:
        w = w.option("key_column", key)
    w.save()
    return df


def test_write_commit_readback(spark, sf_dir, tmp_path):
    df = _write(spark, sf_dir, tmp_path)
    man = sink.read_manifest(str(tmp_path))
    files = sorted(f for f in os.listdir(tmp_path) if f.endswith(".jsonl"))
    assert sorted(man["shards"]) == files
    assert man["key_column"] == "event_type"
    assert man["total_rows"] == df.count()
    # per-shard counts in the manifest match the files
    rows = []
    for f in files:
        with open(tmp_path / f, encoding="utf-8") as fh:
            lines = [json.loads(line) for line in fh]
        assert len(lines) == man["shards"][f]["rows"]
        rows.extend(lines)
    # key column serialized FIRST in every object (Kafka key position)
    with open(tmp_path / files[0], encoding="utf-8") as fh:
        first = fh.readline()
    assert first.startswith('{"event_type"')
    # read-back equality
    expect = {
        (r.event_id, r.event_type, r.user_id, round(r.value, 9))
        for r in df.collect()
    }
    got = {
        (r["event_id"], r["event_type"], r["user_id"], round(r["value"], 9))
        for r in rows
    }
    assert got == expect
    # keyed locality: a key's rows land in exactly one shard
    shard_of = {}
    for f in files:
        with open(tmp_path / f, encoding="utf-8") as fh:
            for line in fh:
                k = json.loads(line)["event_type"]
                shard_of.setdefault(k, set()).add(f)
    assert all(len(s) == 1 for s in shard_of.values())
    # no staging residue
    assert not [d for d in os.listdir(tmp_path) if d.startswith("_tmp-")]


def test_overwrite_replaces_previous_commit(spark, sf_dir, tmp_path):
    _write(spark, sf_dir, tmp_path, parts=4)
    _write(spark, sf_dir, tmp_path, mode="overwrite", parts=2)
    man = sink.read_manifest(str(tmp_path))
    files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
    assert len(files) == 2 and sorted(man["shards"]) == sorted(files)


def test_key_column_must_exist(spark, sf_dir, tmp_path):
    df = load(spark, "events", sf_dir).select("event_id")
    with pytest.raises(Exception, match="key_column"):
        df.write.format(sink.FORMAT_NAME).mode("append").option(
            "path", str(tmp_path)
        ).option("key_column", "nope").save()


def test_abort_leaves_target_unreadable(spark, tmp_path):
    """Driver-side protocol check without a cluster: write() stages
    files, abort() removes them, and the manifest never appears — a
    reader that honors the commit marker sees nothing."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("k", LongType())])
    w = sink.KeyedJsonlWriter({"path": str(tmp_path)}, schema, overwrite=False)
    staged = os.path.join(w.staging, "part-00000.jsonl")
    with open(staged, "w", encoding="utf-8") as f:
        f.write('{"k": 1}\n')
    w.abort([])
    assert not os.path.exists(w.staging)
    with pytest.raises(FileNotFoundError):
        sink.read_manifest(str(tmp_path))


def test_commit_publishes_winning_attempt_and_overwrite_order(spark, tmp_path):
    """Speculative-attempt safety + overwrite crash-ordering: two
    attempts of the same partition stage under DISTINCT names and
    commit() renames exactly the attempt whose ShardCommit Spark
    delivered; overwrite removes the old manifest (the commit marker)
    before any data file, and the old committed files are gone after
    the new manifest lands."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("k", LongType())])
    # a previously committed state
    (tmp_path / "part-99999.jsonl").write_text('{"k": 0}\n', encoding="utf-8")
    (tmp_path / sink.MANIFEST).write_text(
        json.dumps(
            {
                "shards": {"part-99999.jsonl": {"rows": 1, "bytes": 9}},
                "total_rows": 1,
                "key_column": None,
            }
        ),
        encoding="utf-8",
    )
    w = sink.KeyedJsonlWriter({"path": str(tmp_path)}, schema, overwrite=True)
    # two concurrent attempts of partition 0: distinct staged files
    for att, val in ((3, 30), (7, 70)):
        with open(
            os.path.join(w.staging, f"part-00000-attempt-{att}.jsonl"),
            "w",
            encoding="utf-8",
        ) as f:
            f.write(json.dumps({"k": val}) + "\n")
    msg = sink.ShardCommit(
        shard="part-00000.jsonl",
        staged="part-00000-attempt-7.jsonl",
        rows=1,
        n_bytes=12,
    )
    w.commit([msg])
    # the winning attempt's bytes are what got published
    got = json.loads((tmp_path / "part-00000.jsonl").read_text(encoding="utf-8"))
    assert got == {"k": 70}
    # old committed data replaced; manifest describes only the new state
    assert not (tmp_path / "part-99999.jsonl").exists()
    man = sink.read_manifest(str(tmp_path))
    assert sorted(man["shards"]) == ["part-00000.jsonl"]
    assert man["total_rows"] == 1
