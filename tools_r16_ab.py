"""Best-of-3 A/B timing of selected registered queries + er_backfill
under optional extra session conf. Round-16 measurement tool.

Usage: python tools_r16_ab.py [--conf k=v ...] <query|er_backfill|scd2_backfill|curation_backfill> ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    conf: dict[str, str] = {"spark.ui.showConsoleProgress": "false"}
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            conf[k] = v
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark("ab", extra_conf=conf)
    queries = registry.queries()
    # warm like bench.py
    _materialize(queries["q1_pricing_summary"](spark, SF_DIR))
    _materialize(queries["mm_feature_extract"](spark, SF_DIR))
    out: dict[str, list[float]] = {}
    import bench as _b

    for name in names:
        runs: list[float] = []
        if name in ("er_backfill", "scd2_backfill", "curation_backfill"):
            fn = {
                "er_backfill": _b._time_er_backfill,
                "scd2_backfill": _b._time_scd2_backfill,
                "curation_backfill": _b._time_curation_backfill,
            }[name]
            runs, stage_runs = fn(spark)
            best = stage_runs[runs.index(min(runs))]
            print(name, "stages", {k: round(v, 2) for k, v in best.items()})
        else:
            for _ in range(3):
                t0 = time.perf_counter()
                df = queries[name](spark, SF_DIR)
                _materialize(df)
                runs.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        out[name] = runs
    print(json.dumps({"conf": {k: v for k, v in conf.items() if k != "spark.ui.showConsoleProgress"}, "runs": out, "best": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
