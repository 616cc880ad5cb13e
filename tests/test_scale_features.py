"""Engine-level scale features proven against this repo's session
config: AQE skew-join splitting and dynamic partition pruning. These
are the two runtime behaviors the 100 TB story leans on beyond plan
shape — the lint proves no query SHIPS an anti-pattern; these prove
the engine's mitigations actually ENGAGE under this session's
configuration (a misconfigured session could silently disable both
and every plan assertion would still pass)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tuned(spark):
    """Session with thresholds scaled down so local-size data crosses
    the same decision boundaries 100 TB data crosses in production."""
    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in keep.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(tuned):
    spark = tuned
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # one whale key (300k rows in a single hash partition) + a uniform
    # tail; the right side is uniform — the salting-free skew scenario
    # AQE handles by splitting the oversized partition across tasks
    left = spark.range(0, 300_000).select(F.lit(0).alias("k"), F.col("id").alias("v")).union(
        spark.range(0, 5_000).select((F.col("id") % 200).alias("k"), F.col("id").alias("v"))
    )
    right = spark.range(0, 60_000).select(
        (F.col("id") % 200).alias("k"), (F.col("id") * 2).alias("w")
    )
    j = left.join(right, "k")
    plan = j._jdf.queryExecution().executedPlan()
    plan.executeTake(1)  # materializes shuffle stages => AQE finalizes
    s = plan.toString()
    assert "isFinalPlan=true" in s
    assert "skew=true" in s, s[:2000]


def test_dynamic_partition_pruning_engages_on_partitioned_store(spark, tmp_path):
    # month-partitioned fact (the sink's B4 layout) joined to a dim
    # filtered on a NON-partition attribute: static pruning cannot see
    # the surviving months, DPP injects the dim-side subquery filter
    fact = spark.range(0, 50_000).select(
        (F.col("id") % 24 + 202401).alias("month"), F.col("id").alias("v")
    )
    path = str(tmp_path / "fact")
    fact.write.partitionBy("month").mode("overwrite").parquet(path)
    dim = spark.createDataFrame(
        [(202401 + i, f"r{i % 4}") for i in range(24)], "month bigint, region string"
    )
    j = spark.read.parquet(path).join(dim, "month").filter(F.col("region") == "r1")
    s = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in s.lower(), s[:2000]
    # and the pruned scan returns exactly the surviving months' rows
    assert j.count() == 50_000 // 24 * 6 + len([i for i in range(50_000 % 24) if (i % 24) % 4 == 1])
