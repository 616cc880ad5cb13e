"""Round-16 core-scaling spot check: run the demo queries over the
4x-sf0.1 dataset (/root/sfbig, tools_r16_scale_demo.py) at the core
count given by $SPARK_GRAFT_CPUS, best-of-2, and print one JSON line.
Methodology mirrors bench.py (noop sink, callable timed, clearCache
between runs); this is demo evidence only, never the driver bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/sfbig")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.session import get_spark

QUERIES = [
    "q18_large_volume_customer",
    "text_cdc_chunking",
    "stats_bootstrap_ci",
    "graph_pagerank",
    "graph_bfs_layers",
    "dedup_minhash_lsh",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("scale_demo", extra_conf={"spark.ui.showConsoleProgress": "false"})
    q = registry.queries()
    _materialize(q["q1_pricing_summary"](spark, SF_DIR))  # warm JVM
    out = {}
    for name in QUERIES:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            _materialize(q[name](spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        out[name] = min(runs)
    # er_backfill over the demo customer table, bench methodology
    import bench as _b

    runs, _stages = _b._time_er_backfill(spark)
    out["er_backfill"] = min(runs)
    spark.stop()
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "sf_dir": SF_DIR, "best": out}), flush=True)


if __name__ == "__main__":
    main()
