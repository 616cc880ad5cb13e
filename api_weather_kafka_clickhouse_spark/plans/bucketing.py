"""Bucketed-table co-located joins (SURVEY.md §7 Phase 5).

At 100 TB the lineitem ⋈ orders shuffle is the dominant network cost
of every fact-fact query. Bucketing both tables on the join key at
write time (`bucketBy(n, key)` + `sortBy`) makes later joins
shuffle-free: Spark aligns bucket files one-to-one and sort-merge
joins them in place. This module materializes bucketed twins of the
fact tables and exposes the bucketed flagship join;
tests/test_bucketing.py asserts the Exchange really disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load

BUCKETS = 8


def create_bucketed_facts(
    spark: SparkSession, sf_dir: str, database: str = "default", n_buckets: int = BUCKETS
) -> None:
    """Write lineitem/orders as bucketed managed tables (idempotent)."""
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    (
        li.write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(f"{database}.lineitem_bucketed")
    )
    (
        o.write.bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(f"{database}.orders_bucketed")
    )


def bucketed_join(spark: SparkSession, database: str = "default") -> DataFrame:
    """lineitem ⋈ orders on the bucket key — no Exchange on either
    side (verify via plans.checks.shuffle_count == 0 for the join
    inputs)."""
    li = spark.table(f"{database}.lineitem_bucketed")
    o = spark.table(f"{database}.orders_bucketed")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_custkey", "o_totalprice"
    )
