"""Capture .explain('formatted') output for a list of registered
queries into plans/r16/<query>_<tag>.txt (round-16 optimization
evidence). Uses lazy_plans so eager operators expose their raw
operator tree instead of a post-checkpoint file scan, and nothing
executes.

Usage: python tools_r16_capture_plans.py <tag> <query> [<query> ...]
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.plans.stage import lazy_plans
from api_weather_kafka_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r16")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan_capture", cpus=4, shuffle_partitions=4)
    specs = registry.all_specs()
    for name in names:
        fn = specs[name].fn
        with lazy_plans():
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
