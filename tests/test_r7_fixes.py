"""Round-7 hardening regressions:

- compact_tables refuses non-atomic-rename filesystems in CODE (the
  round-6 verdict asked for a guard, not a docstring caveat),
- the centroid store distinguishes foreachBatch REPLAY from checkpoint
  RESET via a persisted stream-run id (round-6 advice: a recreated
  checkpoint over a kept store restarted batch ids at 0 and every new
  batch silently no-opped),
- events_anomaly_zscore guards n>1 / var>0 on BOTH engines (round-6
  advice: a single-row or zero-variance event_type divides by zero —
  NULL-dropped in Spark but NaN>threshold under IEEE DuckDB).
"""

from __future__ import annotations

import datetime
import os
import shutil

import numpy as np
import pytest

from api_weather_kafka_clickhouse_spark.streaming import centroid_store as CS
from api_weather_kafka_clickhouse_spark.streaming import store as store_mod

DIM = 4


def _vecs_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, vec array<double>")


def _batch(spark, start_id, n):
    rng = np.random.default_rng(start_id + 1)
    rows = [
        (start_id + i, [float(rng.normal(0, 1.0)) for _ in range(DIM)]) for i in range(n)
    ]
    return _vecs_df(spark, rows)


# ---------------------------------------------------------------- store


def test_compact_refuses_nonatomic_rename_fs(spark, tmp_path, monkeypatch):
    """On an object-store scheme the guard must raise BEFORE touching
    any table — the store stays exactly as it was."""
    store = str(tmp_path / "nonatomic")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, payload string")
    store_mod.append_partition(df, os.path.join(store, "t"), 0)
    store_mod.append_partition(df, os.path.join(store, "t"), 1)
    before = sorted(os.listdir(os.path.join(store, "t")))

    monkeypatch.setattr(store_mod, "_fs_scheme", lambda fs, path: "s3a")
    with pytest.raises(RuntimeError, match="non-atomic"):
        store_mod.compact_tables(spark, store, (("t", "id bigint, payload string"),))
    assert sorted(os.listdir(os.path.join(store, "t"))) == before


def test_compact_still_runs_on_atomic_fs(spark, tmp_path):
    store = str(tmp_path / "atomic")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, payload string")
    store_mod.append_partition(df, os.path.join(store, "t"), 0)
    store_mod.append_partition(df, os.path.join(store, "t"), 1)
    assert store_mod.compact_tables(spark, store, (("t", "id bigint, payload string"),)) == 1
    out = store_mod.read_store(spark, os.path.join(store, "t"), "id bigint, payload string")
    assert out.count() == 4


# ------------------------------------------------------- centroid store


def test_centroid_checkpoint_reset_raises(spark, tmp_path):
    """Same store, different stream run, batch ids restarted at 0:
    must raise loud, never silently no-op."""
    store = str(tmp_path / "cs_reset")
    CS.centroid_ingest_batch(_batch(spark, 0, 12), 0, store, k=3, dim=DIM, run_id="run-A")
    CS.centroid_ingest_batch(_batch(spark, 12, 12), 1, store, k=3, dim=DIM, run_id="run-A")
    with pytest.raises(RuntimeError, match="checkpoint was reset"):
        CS.centroid_ingest_batch(_batch(spark, 24, 12), 0, store, k=3, dim=DIM, run_id="run-B")


def test_centroid_same_run_replay_still_noop(spark, tmp_path):
    store = str(tmp_path / "cs_replay")
    CS.centroid_ingest_batch(_batch(spark, 0, 12), 0, store, k=3, dim=DIM, run_id="run-A")
    CS.centroid_ingest_batch(_batch(spark, 12, 12), 1, store, k=3, dim=DIM, run_id="run-A")
    before = CS.read_centroid_state(spark, store)
    CS.centroid_ingest_batch(_batch(spark, 12, 12), 1, store, k=3, dim=DIM, run_id="run-A")
    after = CS.read_centroid_state(spark, store)
    assert after == before


def test_centroid_unmarked_store_with_state_raises_for_stream(spark, tmp_path):
    """A store built by direct batch calls (no run marker) later driven
    by a stream cannot compare batch ids — refuse."""
    store = str(tmp_path / "cs_unmarked")
    CS.centroid_ingest_batch(_batch(spark, 0, 12), 0, store, k=3, dim=DIM)  # legacy, no run_id
    with pytest.raises(RuntimeError, match="no _stream_run record"):
        CS.centroid_ingest_batch(_batch(spark, 12, 12), 1, store, k=3, dim=DIM, run_id="run-A")


def test_centroid_batch_api_unaffected(spark, tmp_path):
    """run_id=None keeps the legacy direct-batch behavior end to end."""
    store = str(tmp_path / "cs_legacy")
    CS.centroid_ingest_batch(_batch(spark, 0, 12), 0, store, k=3, dim=DIM)
    CS.centroid_ingest_batch(_batch(spark, 12, 12), 1, store, k=3, dim=DIM)
    cents, counts, applied = CS.read_centroid_state(spark, store)
    assert applied == 1 and sum(counts) == 24


# --------------------------------------------------- anomaly zscore guard


def test_anomaly_zscore_degenerate_groups_match_oracle(spark, tmp_path):
    """A single-row event_type and a zero-variance event_type must be
    dropped by BOTH engines. Without the n>1/var>0 guard DuckDB's
    IEEE NaN (which sorts above any threshold) would flag them while
    Spark's NULL drops them — a real engine divergence, reproduced
    here on a crafted corpus."""
    import duckdb

    from api_weather_kafka_clickhouse_spark.operators.aggregations import events_anomaly_zscore
    from api_weather_kafka_clickhouse_spark.oracle import canon_pandas
    from api_weather_kafka_clickhouse_spark.registry import all_specs

    sf_dir = str(tmp_path / "sf_degenerate")
    os.makedirs(sf_dir)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, 1, "single", 42.0, "{}")]  # n == 1
    rows += [(10 + i, t0, 1, "flat", 7.0, "{}") for i in range(20)]  # var == 0
    rows += [(100 + i, t0, 1, "normal", float(i % 5), "{}") for i in range(50)]
    rows.append((999, t0, 1, "normal", 1000.0, "{}"))  # the one true outlier
    (
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(sf_dir, "events.parquet"))
    )

    s_pdf = events_anomaly_zscore(spark, sf_dir).toPandas()
    assert set(s_pdf["event_type"]) == {"normal"}
    assert 999 in set(s_pdf["event_id"])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}/*.parquet')"
    )
    d_pdf = con.sql(all_specs()["events_anomaly_zscore"].oracle).df()
    con.close()
    assert canon_pandas(s_pdf) == canon_pandas(d_pdf)
