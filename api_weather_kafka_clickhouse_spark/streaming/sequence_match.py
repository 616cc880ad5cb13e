"""Streaming sequence matching: the session STATE MACHINE slot of the
stateful template (`stateful.py` docstring) made concrete.

The batch operator `events_sequence_match` (operators/aggregations.py)
answers "signup followed by its earliest purchase within W days with
no error between" over a complete table. This module maintains the
same pattern INCREMENTALLY over an event stream with
``applyInPandasWithState``: per-user state is the list of pending
signups (start micros + a broken flag), and matches EMIT the moment
their purchase arrives — no rescan, no window over history.

Transition rules (exactly the batch semantics, applied in event-time
order):

- ``signup``    -> append a pending (ts, broken=False) entry
- ``error``     -> mark every pending entry broken (the error is
                   strictly between that signup and any future
                   purchase, so none of them can ever match)
- ``purchase``  -> every UNBROKEN pending entry within the window
                   matches THIS purchase (it is their earliest);
                   matched and broken entries leave the state;
                   entries whose window has lapsed are dropped

State is bounded by signups-per-user-per-window (the sessionize
bound); idle users age out via processing-time timeout when
``evict_ms`` is set. Event-time order is required WITHIN each user:
each micro-batch group is sorted before folding, and cross-batch
order is the source's responsibility (ingest time-ordered batches or
run behind a watermark-sorted stage) — same contract as the batch
twin's window functions. Timestamps fold as exact integer
microseconds; no float enters the state.

`tests/test_streaming_sequence.py` proves stream == batch: the events
table replayed as chronological micro-batches emits exactly the pairs
the batch operator aggregates.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEQ_MATCH_DAYS = 7  # mirrors operators/aggregations.py::SEQ_MATCH_DAYS

STATE_SCHEMA = "s_ts array<long>, broken array<boolean>"
OUTPUT_SCHEMA = "user_id long, s_ts timestamp, p_ts timestamp"

_US_PER_DAY = 86_400 * 1_000_000


def _make_matcher(window_us: int, evict_ms: int | None):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        user_id = key[0]
        if state.exists:
            pend_ts, pend_broken = list(state.get[0]), list(state.get[1])
        else:
            pend_ts, pend_broken = [], []
        out_s: list[int] = []
        out_p: list[int] = []
        max_seen: int | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            batch_max = int(ts_us.max())
            max_seen = batch_max if max_seen is None else max(max_seen, batch_max)
            for t, etype in zip(ts_us, pdf["event_type"]):
                if etype == "signup":
                    pend_ts.append(int(t))
                    pend_broken.append(False)
                elif etype == "error":
                    pend_broken = [True] * len(pend_broken)
                elif etype == "purchase":
                    keep_ts: list[int] = []
                    keep_broken: list[bool] = []
                    for s, broken in zip(pend_ts, pend_broken):
                        if t <= s:  # simultaneous/earlier: not "after"
                            keep_ts.append(s)
                            keep_broken.append(broken)
                        elif t > s + window_us or broken:
                            pass  # lapsed or broken: can never match
                        else:
                            out_s.append(s)
                            out_p.append(int(t))
                    pend_ts, pend_broken = keep_ts, keep_broken
        # end-of-batch pruning: broken entries can never match (their
        # only exit above is a purchase arriving), and entries whose
        # window has lapsed relative to the max event time seen can
        # never match either (cross-batch event-time order is the
        # source contract, so every future purchase has t >= max_seen;
        # match requires t <= s + window). Without this a user who
        # signs up / errors but never purchases would grow state
        # without bound when evict_ms is unset — the docstring's
        # "bounded by signups-per-user-per-window" claim, enforced.
        if max_seen is not None:
            kept = [
                (s, b)
                for s, b in zip(pend_ts, pend_broken)
                if not b and max_seen <= s + window_us
            ]
            pend_ts = [s for s, _ in kept]
            pend_broken = [b for _, b in kept]
        state.update((pend_ts, pend_broken))
        if evict_ms is not None:
            state.setTimeoutDuration(evict_ms)
        if out_s:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_s),
                    "s_ts": pd.to_datetime(out_s, unit="us"),
                    "p_ts": pd.to_datetime(out_p, unit="us"),
                }
            )

    return update


def sequence_matches(
    events: DataFrame,
    window_days: int = SEQ_MATCH_DAYS,
    evict_ms: int | None = None,
) -> DataFrame:
    """signup->purchase(<=window, no error between) matches, emitted
    incrementally. `events` needs (user_id, ts, event_type, event_id)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "event_type", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_matcher(window_days * _US_PER_DAY, evict_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            timeout,
        )
    )
