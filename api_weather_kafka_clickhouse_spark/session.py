"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` (one JVM), but every config here is
chosen to also be the right default on a 1000-executor cluster against
~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  selection) so the same declarative plans survive a 1000x scale-up.
- ``spark.sql.session.timeZone=UTC`` — the reference mixes Moscow wall
  time and naive local time (reference app/clickhouse_db.py:39-57); we
  normalize to UTC instants everywhere (SURVEY.md §1.4).
- Arrow enabled so the few Pandas-UDF operators (HTTP source, multimodal
  decode) use vectorized batch transfer instead of row pickling.
- Shuffle partitions sized from the env (local) — on a real cluster AQE
  coalescing makes the initial number far less critical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "api_weather_kafka_clickhouse_spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session. Idempotent: getOrCreate."""
    n = cpus or default_parallelism()
    shuffle = shuffle_partitions or n
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE for CACHED plans too (off by default): every .persist()
        # otherwise materializes at the raw spark.sql.shuffle.partitions
        # with no runtime coalescing, so the iterative operators (CC /
        # pagerank / BFS label loops) and the ingest batch bodies paid a
        # full-width task wave per iteration/batch regardless of data
        # size. With it on, cached-plan exchanges size themselves from
        # runtime bytes exactly like uncached ones — data-adaptive at
        # every scale, not a local[N] constant (guide §2.2 "fewer,
        # larger partitions"; measured r16: er_backfill 26.1->16.7 s,
        # graph_bfs_layers 8.1->5.9 s, graph_pagerank 7.6->6.2 s at
        # sf0.1, identical results).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no
        # nanos type — read as long, tables.load converts to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
