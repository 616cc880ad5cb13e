"""Incremental rollup (streaming materialized view): merged partials
must equal a direct aggregation of the fact table, and a replayed
batch must not double-count (dynamic overwrite by batch_id)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.streaming import pipeline, rollup
from tests.test_ingest_flatten import FULL_PAYLOAD, SPARSE_PAYLOAD


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "batch0.json").write_text(
        "\n".join([json.dumps(FULL_PAYLOAD), json.dumps(SPARSE_PAYLOAD)])
    )
    return d


def _collect_map(df):
    return {
        (r.event_date, r.city_name): (r.n_obs, r.t_min, r.t_max, round(r.t_avg, 6))
        for r in df.collect()
    }


def test_rollup_matches_direct_aggregation(spark, stream_dir, tmp_path):
    wh, rp = str(tmp_path / "wh"), str(tmp_path / "rollup")
    # run the fact pipeline and the rollup off the same input
    q = pipeline.start_pipeline(
        pipeline.read_stream_json_files(spark, str(stream_dir)), wh, str(tmp_path / "ck1")
    )
    q.awaitTermination(120)
    q = rollup.start_rollup(
        pipeline.transform(pipeline.read_stream_json_files(spark, str(stream_dir))),
        rp,
        str(tmp_path / "ck2"),
    )
    q.awaitTermination(120)

    direct = (
        spark.read.parquet(wh)
        .groupBy("event_date", "city_name")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.min("temperature").alias("t_min"),
            F.max("temperature").alias("t_max"),
            (
                F.sum(F.col("temperature").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("t_avg"),
        )
    )
    assert _collect_map(rollup.read_rollup(spark, rp)) == _collect_map(direct)


def test_rollup_compaction_preserves_answers(spark, stream_dir, tmp_path):
    rp, ck = str(tmp_path / "rollup"), str(tmp_path / "ck")
    q = rollup.start_rollup(
        pipeline.transform(pipeline.read_stream_json_files(spark, str(stream_dir))), rp, ck
    )
    q.awaitTermination(120)
    (stream_dir / "batch1.json").write_text(
        json.dumps(dict(FULL_PAYLOAD, name="Third City"))
    )
    q = rollup.start_rollup(
        pipeline.transform(pipeline.read_stream_json_files(spark, str(stream_dir))), rp, ck
    )
    q.awaitTermination(120)

    before = _collect_map(rollup.read_rollup(spark, rp))
    rollup.compact_rollup(spark, rp, ck)
    after = _collect_map(rollup.read_rollup(spark, rp))
    assert after == before
    # all committed batches folded into the single compacted partition
    batch_ids = {
        r.batch_id for r in spark.read.parquet(rp).select("batch_id").distinct().collect()
    }
    assert batch_ids == {-1}
    # replay after compaction must not double-count: rerun with the
    # same checkpoint (no new data) and re-read
    q = rollup.start_rollup(
        pipeline.transform(pipeline.read_stream_json_files(spark, str(stream_dir))), rp, ck
    )
    q.awaitTermination(120)
    assert _collect_map(rollup.read_rollup(spark, rp)) == before


def test_rollup_replay_is_idempotent(spark, stream_dir, tmp_path):
    """Re-running with the same checkpoint must not duplicate partials
    (each batch overwrites its own batch_id partition); new files
    produce NEW batch ids that merge in."""
    rp, ck = str(tmp_path / "rollup"), str(tmp_path / "ck")

    def run():
        q = rollup.start_rollup(
            pipeline.transform(pipeline.read_stream_json_files(spark, str(stream_dir))),
            rp,
            ck,
        )
        q.awaitTermination(120)

    run()
    first = _collect_map(rollup.read_rollup(spark, rp))
    run()  # replay, no new data -> unchanged
    assert _collect_map(rollup.read_rollup(spark, rp)) == first

    extra = dict(FULL_PAYLOAD, name="Third City")
    (stream_dir / "batch1.json").write_text(json.dumps(extra))
    run()  # new file -> new batch id merges in
    merged = _collect_map(rollup.read_rollup(spark, rp))
    assert len(merged) == len(first) + 1
    assert any(k[1] == "Third City" for k in merged)
