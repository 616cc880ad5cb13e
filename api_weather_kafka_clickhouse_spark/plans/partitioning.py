"""Size-adaptive partition counts for explicit pre-explode exchanges.

The hot kernels (shingle/simhash tokenize, per-char CDC chunking, the
bootstrap digest fan-out) repartition their NARROW input rows by key
immediately before an explode/replication so the expensive per-row
work runs at cluster parallelism instead of the scan's split count,
and the explicit count stops AQE from coalescing the deliberately
small exchange back to one partition (round-15).

``defaultParallelism`` alone is scale-adaptive in CORE count but not
in DATA size: at 100 TB with, say, 10k cores a doc-keyed exchange
would land ~10 GB per partition feeding an explode — a spill/OOM
hazard (guide §5; round-15 verdict item 2). This helper sizes the
count from the optimizer's estimate of the frame's bytes with the
core count as a floor:

    max(defaultParallelism, ceil(estimated_bytes / target))

At bench scale the estimate is far below one target chunk, so the
count stays exactly ``defaultParallelism`` (same plans, same
numbers); at warehouse scale the byte term takes over and per-task
input stays bounded. The estimate is Catalyst's (file size x filter
selectivity) — cheap driver-side plan stats, no job.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame

# Per-partition input-byte target for a pre-explode exchange. 64 MB of
# NARROW pre-explode rows is conservative: the explode typically
# multiplies rows ~5-10x downstream of the exchange (guide §2.2 wants
# 100 MB-1 GB post-shuffle partitions; the multiplier eats the gap).
# Env-overridable for deployments whose explode factor differs.
FANOUT_TARGET_BYTES = int(
    os.environ.get("SPARK_GRAFT_FANOUT_TARGET_BYTES", str(64 << 20))
)

# Runaway guard: never ask for more initial partitions than this —
# beyond it, task-launch metadata itself becomes the bottleneck and
# the job should be restructured instead (2^18 partitions x 64 MB
# targets ~16 TB of narrow rows through ONE exchange).
_MAX_PARTITIONS = 1 << 18

# Estimates at or above this are "unknown", not data: Catalyst
# substitutes spark.sql.defaultSizeInBytes (Long.MaxValue) when a
# node's size cannot be derived — notably an InMemoryRelation that has
# not materialized yet (a caller passing an unmaterialized .persist()
# frame would otherwise read 8 EB and ask for the partition cap; a
# 9-row ingest micro-batch did exactly that in round-16 testing).
_UNKNOWN_ESTIMATE = 1 << 50  # 1 PB — far above any single-exchange input


def fanout_partitions(df: DataFrame, target_bytes: int | None = None) -> int:
    """Partition count for an explicit keyed exchange feeding an
    explode: the core-count floor, raised by estimated input size."""
    par = df.sparkSession.sparkContext.defaultParallelism
    target = target_bytes or FANOUT_TARGET_BYTES
    try:
        # Catalyst BigInt -> str -> int (py4j has no BigInt coercion)
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:  # pragma: no cover — Connect/estimation failure
        return par
    if est <= 0 or est >= _UNKNOWN_ESTIMATE:
        return par
    return max(par, min(_MAX_PARTITIONS, math.ceil(est / target)))
