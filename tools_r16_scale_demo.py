"""Generate a 4x-sf0.1 dataset (sf0.4-equivalent) for the round-16
core-scaling spot check (r15 verdict item 7: sf0.1 cannot distinguish
"overhead-bound at toy scale" from "serial by construction").

Replicates sf0.1 four times with DISJOINT id offsets so the chosen
demo queries scale their WORK ~linearly (disjoint graph copies,
per-row digests, per-doc chunking, per-replica ER block spaces):

- lineitem/supplier/part ids offset per replica (graph queries see 4
  disjoint copies of the bipartite graph);
- orders/customer keys offset consistently (q18's joins see 4
  independent key spaces);
- events event_id/user_id offset (bootstrap digests are per (g, id));
- documents doc_id offset (CDC chunking is per-doc);
- customer names PREFIXED with the replica tag (the ER blocker keys
  on nation|name-prefix, so each replica gets its own block space —
  without this, 4 copies of every name would inflate candidate pairs
  ~16x and measure SemDeDup-style superlinear work, not parallelism).

Output: /root/sfbig/<table>.parquet. NOT driver data; never read by
bench.py — demo only (tools_r16_scale_demo_run.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.session import get_spark
from api_weather_kafka_clickhouse_spark.tables import load

SRC = "/root/testdata/sf0.1"
OUT = "/root/sfbig"
REPLICAS = 4

spark = get_spark("scale_demo_gen", extra_conf={"spark.ui.showConsoleProgress": "false"})

# offsets: one round power-of-ten-ish stride per key space, far above
# the sf0.1 max of each key
STRIDE = {
    "l_orderkey": 10_000_000,
    "l_suppkey": 1_000_000,
    "l_partkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}


def replicate(name: str, key_cols: list[str], name_col: str | None = None):
    df = load(spark, name, SRC)
    parts = []
    for k in range(REPLICAS):
        r = df
        for c in key_cols:
            r = r.withColumn(c, F.col(c) + F.lit(k * STRIDE[c]))
        if name_col is not None and k > 0:
            r = r.withColumn(name_col, F.concat(F.lit(f"r{k}~"), F.col(name_col)))
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(OUT, f"{name}.parquet"))
    print("wrote", name)


replicate("lineitem", ["l_orderkey", "l_suppkey", "l_partkey"])
replicate("orders", ["o_orderkey", "o_custkey"])
replicate("customer", ["c_custkey"], name_col="c_name")
replicate("events", ["event_id", "user_id"])
replicate("documents", ["doc_id"])
# small dims copied verbatim (queries only join them)
for t in ("region", "nation", "supplier", "part", "embeddings"):
    load(spark, t, SRC).write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))
    print("copied", t)
spark.stop()
