"""End-to-end batch cycle: cities → fetch → archive → flatten →
warehouse → query, hermetic via the injected fetcher."""

from __future__ import annotations

import json

from api_weather_kafka_clickhouse_spark import app
from tests.test_cities import FIXTURE
from tests.test_sources import make_fake_fetcher


def test_polling_loop_cycles_and_error_backoff(spark, tmp_path, monkeypatch):
    """A11 parity: 300 s cycle cadence, 60 s backoff after a failed
    cycle, loop keeps running (Producer_clickhouse.py:100-142)."""
    cities_path = tmp_path / "cities.json"
    cities_path.write_text(json.dumps(FIXTURE))
    wh = str(tmp_path / "warehouse")
    sleeps: list[float] = []

    real_cycle = app.run_batch_cycle
    calls = {"n": 0}

    def flaky_cycle(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("API down this cycle")
        return real_cycle(*args, **kwargs)

    monkeypatch.setattr(app, "run_batch_cycle", flaky_cycle)
    reports = app.run_polling_loop(
        spark,
        str(cities_path),
        make_fake_fetcher(),
        wh,
        interval_seconds=300.0,
        error_backoff_seconds=60.0,
        max_cycles=3,
        sleep=sleeps.append,
    )
    assert len(reports) == 3
    assert reports[0] == {"error": 1}
    assert reports[1]["n_fetched"] == 5 and reports[2]["n_fetched"] == 5
    assert sleeps == [60.0, 300.0]  # backoff after failure, cadence after success
    assert spark.read.parquet(wh).count() == 10


def test_polling_loop_reclaims_own_scratch_only(spark, tmp_path, monkeypatch):
    """Long-lived-session hygiene, scoped correctly: the loop reclaims
    checkpoint dirs created DURING its cycles (so a run-forever loop
    doesn't fill the scratch volume), but must NOT delete dirs that
    were already tracked at loop entry — those may back DataFrames
    other code in the shared session still holds."""
    from api_weather_kafka_clickhouse_spark.plans import stage

    cities_path = tmp_path / "cities.json"
    cities_path.write_text(json.dumps(FIXTURE))
    wh = str(tmp_path / "warehouse_reclaim")

    # a pre-loop checkpoint whose DataFrame stays live across the loop
    leftover = stage.stage_checkpoint(spark.range(10), "loop_leftover")
    assert leftover.count() == 10

    # make each cycle leak one unscoped operator checkpoint (stand-in
    # for a checkpointing operator invoked inside the cycle)
    real_cycle = app.run_batch_cycle

    def leaky_cycle(*args, **kwargs):
        stage.stage_checkpoint(spark.range(5), "cycle_leak").count()
        return real_cycle(*args, **kwargs)

    # a checkpoint another caller registers BETWEEN cycles (the sleep
    # runs after cycle 1's reclaim, before cycle 2): round-5's
    # snapshot-at-loop-entry exclude could not tell it from the loop's
    # own dirs and deleted it out from under the caller's DataFrame —
    # the per-cycle before/after diff must leave it alone
    mid_loop: dict[str, object] = {}

    def concurrent_sleep(_s):
        if not mid_loop:
            mid_loop["df"] = stage.stage_checkpoint(spark.range(7), "mid_loop_concurrent")
            assert mid_loop["df"].count() == 7

    monkeypatch.setattr(app, "run_batch_cycle", leaky_cycle)
    app.run_polling_loop(
        spark,
        str(cities_path),
        make_fake_fetcher(),
        wh,
        max_cycles=2,
        sleep=concurrent_sleep,
    )
    live = stage.live_checkpoint_dirs()
    assert not any("cycle_leak" in d for d in live), (
        "dirs created during the loop's cycles must be reclaimed"
    )
    assert any("loop_leftover" in d for d in live), (
        "pre-loop dirs may back live frames elsewhere — never reclaimed by the loop"
    )
    assert leftover.count() == 10, "the pre-loop frame must still be readable"
    assert any("mid_loop_concurrent" in d for d in live), (
        "a checkpoint registered between cycles by other code must "
        "survive the next cycle's reclaim"
    )
    assert mid_loop["df"].count() == 7, (
        "the concurrent caller's DataFrame must remain readable"
    )
    # cleanup so later tests see a drained tracker
    stage.reclaim_checkpoints(spark)


def test_full_batch_cycle(spark, tmp_path):
    cities_path = tmp_path / "cities.json"
    cities_path.write_text(json.dumps(FIXTURE))
    wh = str(tmp_path / "warehouse")
    archive = str(tmp_path / "archive")

    stats = app.run_batch_cycle(
        spark, str(cities_path), make_fake_fetcher(), wh, archive_path=archive
    )
    assert stats == {"n_cities": 6, "n_fetched": 5, "n_failed": 1}

    # warehouse holds the 5 successful cities, partitioned by month
    fact = spark.read.parquet(wh)
    assert fact.count() == 5
    assert "event_month" in fact.columns

    # archive kept raw payloads with topic routing
    arch = spark.read.json(archive)
    assert arch.count() == 5
    assert set(arch.columns) >= {"name", "topic", "value"}
    topics = {r.topic for r in arch.select("topic").distinct().collect()}
    assert topics <= {"weather_topic_1", "weather_topic_2", "weather_topic_3"}

    # second cycle appends (the reference's 300 s repeat)
    app.run_batch_cycle(spark, str(cities_path), make_fake_fetcher(), wh)
    assert spark.read.parquet(wh).count() == 10

    # query layer over the warehouse
    summary = app.warehouse_summary(spark, wh)
    rows = summary.collect()
    assert all(r.n_obs == 2 for r in rows)  # two cycles per city
    assert len(rows) == 5
