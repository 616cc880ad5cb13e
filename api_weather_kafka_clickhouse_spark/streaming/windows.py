"""Event-time streaming layer — the capabilities the reference lacks
entirely (SURVEY.md §2-C: watermarks, event-time windows, session
windows, stateful dedup). Built on the `dt`-based event-time flatten
(sources/flatten.flatten_weather_event_time) or any (ts, key, value)
stream such as the test `events` table replayed as a stream.

All operators follow the watermark discipline: state is bounded by
the watermark delay, so they run indefinitely at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "city_name",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window aggregate with late-data handling."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def sliding_avg(
    stream: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "city_name",
    value_col: str = "temperature",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window average (overlapping windows)."""
    v = F.col(value_col).cast("double")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), F.col(key_col))
        .agg(F.avg(v).alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "avg_value",
            "n",
        )
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) — the streaming twin of the batch
    sessionize operator (operators/windows.py)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "15 minutes",
    watermark: str = "30 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: match right-stream rows to
    left-stream rows with the same `key` whose event times lie within
    ``[left_ts - max_lag, left_ts + max_lag]`` — the enrichment shape
    (e.g. sensor readings ⋈ station alerts) the reference's
    processing-time pipeline cannot express at all.

    Both inputs MUST carry a watermark plus the explicit time-range
    predicate: that pair is what lets Spark evict buffered state —
    a left row older than ``watermark + max_lag`` past the max seen
    event time can never match a future right row, so per-key state
    is bounded no matter how long the query runs (the 100 TB/forever
    requirement). Without the range condition Spark would buffer both
    streams indefinitely (and reject outer joins outright).

    ``join_type`` may be "inner" or the outer variants Spark supports
    for stream-stream joins ("leftOuter"/"rightOuter"/"fullOuter");
    outer results for unmatched rows are emitted only once the
    watermark closes their interval. Timestamp columns are both kept,
    suffixed via select aliases on the caller's side if needed —
    `key` is coalesced into one output column.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    lk = F.col(f"__l.{key}")
    rk = F.col(f"__r.{key}")
    lts = F.col(f"__l.{left_ts}")
    rts = F.col(f"__r.{right_ts}")
    cond = (
        (lk == rk)
        & (rts >= lts - F.expr(f"INTERVAL {max_lag}"))
        & (rts <= lts + F.expr(f"INTERVAL {max_lag}"))
    )
    joined = lw.alias("__l").join(rw.alias("__r"), cond, join_type)
    # one key column out (outer joins null the unmatched side's key)
    return joined.select(
        F.coalesce(lk, rk).alias(key),
        *[F.col(f"__l.{c}") for c in left.columns if c != key],
        *[F.col(f"__r.{c}").alias(f"r_{c}" if c in left.columns else c) for c in right.columns if c != key],
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("city_name", "event_time"),
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful exact dedup within the watermark horizon — the
    replay-duplicate guard the reference disables in ClickHouse
    (insert_deduplicate=0, clickhouse_db.py:23). State size is
    bounded: keys older than the watermark are dropped."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(key_cols))
