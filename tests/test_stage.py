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
