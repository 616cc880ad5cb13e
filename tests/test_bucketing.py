"""Bucketed co-located join: the shuffle really disappears."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.plans import bucketing, checks
from api_weather_kafka_clickhouse_spark.tables import load


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # (warehouse dir is a static conf — managed tables land in the
    # session default spark-warehouse, dropped in the finally)
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketing.create_bucketed_facts(spark, sf_dir)
        joined = bucketing.bucketed_join(spark)
        plan = checks.simple_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        # the same join on plain parquet DOES shuffle — the contrast
        li = load(spark, "lineitem", sf_dir)
        o = load(spark, "orders", sf_dir)
        plain = li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey", "o_custkey")
        assert checks.shuffle_count(plain) >= 2

        # and it computes the same row count
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
