"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2-C: the stateful layer the reference lacks entirely).

Running per-key statistics (count / mean / min / max of a value
column) maintained across micro-batches in Spark-managed state, with
optional processing-time eviction. This is the template any custom
stateful operator (EWMA anomaly scores, per-entity CDC folding,
session state machines) plugs into:

- state lives in the state store (checkpointed, partitioned by key —
  scales horizontally with keys, bounded by timeout eviction);
- per-batch work is an Arrow-batched pandas function per key group;
- output is the updated running row per key per batch.

Exact math note: the running mean is kept as (sum_cents: int, n) so
state accumulation is integer-exact regardless of batch order, per
the engine's decimal determinism convention.

Eviction note: pass `evict_ms` in production so idle keys age out of
the state store. Leave it None for availableNow/test drives —
ProcessingTimeTimeout keeps the micro-batch engine scheduling
timeout-only batches, which never settles `processAllAvailable()`.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "sum_cents long, n long, v_min double, v_max double"
OUTPUT_SCHEMA = "key string, n long, mean double, v_min double, v_max double"


def _make_updater(evict_ms: int | None):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            sum_cents, n, v_min, v_max = state.get
        else:
            sum_cents, n, v_min, v_max = 0, 0, float("inf"), float("-inf")
        for pdf in pdfs:
            # NULL values arrive as NaN via Arrow; pandas sum/min/max
            # skip NaN but len() would count it — without the dropna
            # the mean biases low and an all-NULL batch would poison
            # min/max with inf sentinels
            v = pdf["value"].dropna()
            if v.empty:
                continue
            # 2-decimal values -> integer cents: state math stays exact
            sum_cents += int(round(float(v.sum()) * 100))
            n += len(v)
            v_min = min(v_min, float(v.min()))
            v_max = max(v_max, float(v.max()))
        if n == 0:
            # no numeric observation for this key yet: no state row to
            # checkpoint, no output (emitting would divide by zero)
            return
        state.update((sum_cents, n, v_min, v_max))
        if evict_ms is not None:
            state.setTimeoutDuration(evict_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "mean": [sum_cents / 100.0 / n],
                "v_min": [v_min],
                "v_max": [v_max],
            }
        )

    return update


def running_stats(
    stream: DataFrame, key_col: str, value_col: str, evict_ms: int | None = None
) -> DataFrame:
    """Per-key running stats across micro-batches. `stream` needs
    (key_col, value_col); emits one updated row per active key per
    batch. See module docstring for `evict_ms` semantics."""
    from pyspark.sql import functions as F

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _make_updater(evict_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
