"""plans/stage.py contracts: scoped checkpoints delete their files,
and eager_release never leaks caches — even on a failing write."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.plans import stage


def test_scoped_checkpoint_removes_files(spark):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    with stage.scoped_checkpoint(df, "scope_test") as out:
        assert out.count() == 100
        paths = glob.glob(os.path.join(stage._root(), "scope_test_*"))
        assert paths, "checkpoint dir should exist inside the scope"
    assert not glob.glob(os.path.join(stage._root(), "scope_test_*")), (
        "scoped checkpoint must delete its dir on exit (a run-forever "
        "polling loop would otherwise leak one sweep per cycle)"
    )


def test_reclaim_checkpoints_deletes_tracked_dirs(spark):
    df = spark.range(50).withColumn("x", F.col("id") * 3)
    out1 = stage.stage_checkpoint(df, "reclaim_a")
    out2 = stage.stage_checkpoint(df.filter("id < 10"), "reclaim_b")
    assert out1.count() == 50 and out2.count() == 10  # fully consumed
    tracked = [d for d in stage.live_checkpoint_dirs() if "reclaim_" in d]
    assert len(tracked) == 2 and all(os.path.isdir(d) for d in tracked)
    before = len(stage.live_checkpoint_dirs())
    removed = stage.reclaim_checkpoints(spark)
    assert removed == before, "every tracked dir counts toward the return value"
    assert stage.live_checkpoint_dirs() == (), "_LIVE_DIRS must drain"
    assert not any(os.path.exists(d) for d in tracked), "dirs must be gone from disk"


def test_reclaim_checkpoints_logs_not_raises_on_fs_error(spark, caplog):
    """A dir that vanished out from under the tracker (cluster scratch
    retention beat us to it, permission flap) must not abort the
    reclamation sweep — the entry is dropped and the rest proceed."""
    df = spark.range(5)
    out = stage.stage_checkpoint(df, "reclaim_err")
    assert out.count() == 5
    stage._LIVE_DIRS.append("/nonexistent/spark_graft_bogus_dir")
    # Hadoop LocalFS delete() on a missing path returns false (no
    # throw), so force a real failure: an unparseable URI
    stage._LIVE_DIRS.append("::not a uri::")
    with caplog.at_level("WARNING", logger=stage.log.name):
        removed = stage.reclaim_checkpoints(spark)
    assert removed >= 1, "healthy dirs still reclaimed despite the bad entry"
    assert stage.live_checkpoint_dirs() == (), "bad entries are dropped, not retried forever"
    assert "failed to reclaim" in caplog.text, "FS errors are logged, never raised"


def test_drop_checkpoint_dir_keeps_entry_on_failure(spark, caplog):
    """A failed per-dir delete must leave the path TRACKED so a later
    reclaim sweep retries it — untracking a surviving dir would leak
    it for the process lifetime (round-5 review finding). The sweep
    itself stays terminal (bad entries dropped, see the reclaim test
    above) — the two policies differ on purpose."""
    df = spark.range(5)
    path, out = stage.stage_checkpoint_with_path(df, "drop_keep")
    assert out.count() == 5
    bad = "::not a uri::"  # unparseable — the FS call throws
    stage._LIVE_DIRS.append(bad)
    with caplog.at_level("WARNING", logger=stage.log.name):
        stage.drop_checkpoint_dir(spark, bad)
    assert "failed to drop" in caplog.text
    assert bad in stage.live_checkpoint_dirs(), (
        "a failed delete must stay tracked for a later reclaim retry"
    )
    # the healthy dir still drops normally
    stage.drop_checkpoint_dir(spark, path)
    assert path not in stage.live_checkpoint_dirs() and not os.path.exists(path)
    # and the terminal sweep clears the bad entry
    stage.reclaim_checkpoints(spark)
    assert bad not in stage.live_checkpoint_dirs()


def test_eager_release_unpersists_on_write_failure(spark):
    cached = spark.range(10).persist()
    cached.count()
    # a result whose materialization always throws at runtime
    failing = cached.select(F.assert_true(F.col("id") < 5).alias("boom"), "id")
    with pytest.raises(Exception):
        stage.eager_release(failing, "fail_test", cached)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0, (
        "eager_release must drop caches on the exception path too"
    )
