"""Deterministic sharded JSONL export (sources/export.py): shard
placement is a pure function of the key, re-exports produce identical
manifests, the landed files verify against the manifest, and
corruption (missing shard / dropped rows) is detected."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.sources.export import (
    SHARD_COL,
    export_jsonl,
    manifest,
    read_export,
    verify_export,
)
from api_weather_kafka_clickhouse_spark.tables import load

N_SHARDS = 8


def _docs(spark, sf_dir):
    return load(spark, "documents", sf_dir).select("doc_id", "text", "lang", "source")


def test_export_roundtrip_and_shard_placement(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "exp")
    m = export_jsonl(docs, path, "doc_id", N_SHARDS).collect()
    assert sum(r["n_rows"] for r in m) == docs.count()
    assert {r[SHARD_COL] for r in m} <= set(range(N_SHARDS))

    back = read_export(spark, path)
    # every row landed in the shard its key hashes to
    misplaced = back.filter(
        F.col(SHARD_COL)
        != F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(N_SHARDS)).cast("int")
    )
    assert misplaced.count() == 0
    # full-fidelity round trip on the value columns
    a = {tuple(r) for r in docs.collect()}
    b = {
        (r["doc_id"], r["text"], r["lang"], r["source"])
        for r in back.collect()
    }
    assert a == b


def test_reexport_is_deterministic(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    m1 = {tuple(r) for r in export_jsonl(docs, str(tmp_path / "a"), "doc_id", N_SHARDS).collect()}
    m2 = {
        tuple(r)
        for r in export_jsonl(
            docs.repartition(13), str(tmp_path / "b"), "doc_id", N_SHARDS
        ).collect()
    }
    assert m1 == m2


def test_verify_export_clean_and_corrupt(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "exp")
    export_jsonl(docs, path, "doc_id", N_SHARDS)
    assert verify_export(spark, path, "doc_id").count() == 0

    # corruption 1: a whole shard directory vanishes
    victims = sorted(d for d in os.listdir(path) if d.startswith(f"{SHARD_COL}="))
    shutil.rmtree(os.path.join(path, victims[0]))
    bad = verify_export(spark, path, "doc_id").collect()
    assert len(bad) == 1 and bad[0]["found_rows"] is None

    # corruption 2: a shard loses rows (truncate its json file; drop
    # the local-FS .crc sidecar too — bit-rot is the filesystem's
    # detection job, lost rows are the manifest's)
    part = None
    for root, _, files in os.walk(os.path.join(path, victims[1])):
        for f in files:
            if f.endswith(".json"):
                part = os.path.join(root, f)
            if f.endswith(".crc"):
                os.remove(os.path.join(root, f))
    with open(part) as fh:
        lines = fh.readlines()
    with open(part, "w") as fh:
        fh.writelines(lines[:-1])
    bad2 = verify_export(spark, path, "doc_id").collect()
    shards_bad = {r[SHARD_COL] for r in bad2}
    assert int(victims[1].split("=")[1]) in shards_bad


def test_manifest_signature_is_order_and_split_independent(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    m1 = {tuple(r) for r in manifest(docs, "doc_id", N_SHARDS).collect()}
    m2 = {
        tuple(r)
        for r in manifest(
            docs.repartition(31).sortWithinPartitions("lang"), "doc_id", N_SHARDS
        ).collect()
    }
    assert m1 == m2 and len(m1) > 0
