"""Supervision tests (SURVEY.md §2-B7): a streaming query killed
mid-stream by a sink failure must restart from its checkpoint and
finish with no data loss — the supervisord autorestart parity
(reference cron_src/supervisord.conf:16-35)."""

from __future__ import annotations

import json

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from api_weather_kafka_clickhouse_spark.sources.sink import write_fact
from api_weather_kafka_clickhouse_spark.streaming import pipeline
from api_weather_kafka_clickhouse_spark.streaming.supervisor import run_supervised
from tests.test_ingest_flatten import FULL_PAYLOAD, SPARSE_PAYLOAD


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "batch0.json").write_text(
        "\n".join([json.dumps(FULL_PAYLOAD), json.dumps(SPARSE_PAYLOAD)])
    )
    return d


def _start_flaky(spark, stream_dir, tmp_path, crash_flag):
    """Fresh query against a fixed checkpoint whose sink crashes while
    the flag file exists — the crash happens BEFORE any write, so the
    replayed batch cannot double-append."""
    wh = str(tmp_path / "warehouse")

    def sink(batch_df, batch_id):
        if crash_flag.exists():
            crash_flag.unlink()
            raise RuntimeError("injected sink failure")
        write_fact(batch_df, wh)

    fact = pipeline.transform(pipeline.read_stream_json_files(spark, str(stream_dir)))
    return (
        fact.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )


def test_supervisor_restarts_after_sink_failure(spark, stream_dir, tmp_path):
    crash_flag = tmp_path / "crash_once"
    crash_flag.touch()
    report = run_supervised(
        lambda: _start_flaky(spark, stream_dir, tmp_path, crash_flag),
        max_restarts=3,
        backoff_seconds=0.1,
    )
    assert report.restarts == 1
    assert report.clean_stop
    assert "injected sink failure" in report.errors[0]
    out = spark.read.parquet(str(tmp_path / "warehouse"))
    assert out.count() == 2  # replayed batch landed exactly once


def test_supervisor_gives_up_after_max_restarts(spark, stream_dir, tmp_path):
    def start_always_failing():
        def sink(batch_df, batch_id):
            raise RuntimeError("permanent sink failure")

        fact = pipeline.transform(
            pipeline.read_stream_json_files(spark, str(stream_dir))
        )
        return (
            fact.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt_fatal"))
            .trigger(availableNow=True)
            .start()
        )

    with pytest.raises(StreamingQueryException) as excinfo:
        run_supervised(start_always_failing, max_restarts=1, backoff_seconds=0.05)
    # escalation carries the crash-loop history for the outer scheduler
    report = excinfo.value.supervisor_report
    assert report.restarts == 1  # one restart was actually performed
    assert len(report.errors) == 2  # both failures recorded
    assert not report.clean_stop
