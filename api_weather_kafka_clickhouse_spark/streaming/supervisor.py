"""Process supervision for streaming queries (SURVEY.md §2-B7).

The reference keeps its producer/consumer alive with supervisord
(`autorestart=true`, `cron_src/supervisord.conf:16-35`) plus a
container healthcheck (`docker-compose.yaml:131-136`). Spark's
equivalent unit of failure is the StreamingQuery: a sink/task error
terminates the query with a StreamingQueryException, and the
checkpoint WAL guarantees the failed micro-batch replays on restart —
so a restart loop with bounded backoff gives the same
crash-loop-protected, no-data-loss semantics the reference gets from
supervisord, with a stronger recovery guarantee (offset replay is
driven by the checkpoint, not a manual commit).

`run_supervised` is deliberately synchronous (the supervisord model:
one supervised long-running unit per process); multi-query drivers
can run one supervisor per thread.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.errors.exceptions.captured import StreamingQueryException
from pyspark.sql.streaming import StreamingQuery


@dataclass
class SupervisorReport:
    """Counters surfaced after the supervised run (A21 parity)."""

    restarts: int = 0
    clean_stop: bool = False
    errors: list[str] = field(default_factory=list)


def run_supervised(
    start_query: Callable[[], StreamingQuery],
    max_restarts: int = 3,
    backoff_seconds: float = 1.0,
    max_backoff_seconds: float = 60.0,
    await_timeout_seconds: float | None = None,
    healthy_after_seconds: float = 60.0,
) -> SupervisorReport:
    """Run a streaming query to termination, restarting on failure.

    `start_query` must create a FRESH query against the SAME
    checkpoint location each time — that is what makes the restart
    lossless (the failed micro-batch is replayed from the WAL).

    Backoff doubles per consecutive failure (supervisord's
    startretries+delay analogue) and is capped; a run that survives
    `healthy_after_seconds` before failing resets the consecutive
    counter (supervisord's startsecs), so a long-lived query is not
    killed by unrelated transient failures spread over its lifetime.
    After `max_restarts` consecutive failures the last exception
    propagates so an outer scheduler (cluster manager / container
    runtime) can take over — the same escalation supervisord performs
    when a program enters FATAL state. Failures while STARTING the
    query count like query failures (they are the crash-loop case).
    """
    report = SupervisorReport()
    consecutive = 0

    def register_failure(exc: Exception, started_at: float) -> None:
        nonlocal consecutive
        report.errors.append(str(exc))
        if time.monotonic() - started_at >= healthy_after_seconds:
            consecutive = 0  # ran healthily before this failure
        consecutive += 1
        if consecutive > max_restarts:
            # escalate with the crash-loop history attached: callers
            # deciding FATAL-state handling get the full report, not
            # just the last exception
            exc.supervisor_report = report  # type: ignore[attr-defined]
            raise exc
        report.restarts += 1  # counts restarts actually performed
        time.sleep(min(backoff_seconds * 2 ** (consecutive - 1), max_backoff_seconds))

    while True:
        started_at = time.monotonic()
        try:
            query = start_query()
        except Exception as exc:  # noqa: BLE001 — start failure IS the crash-loop case
            register_failure(exc, started_at)
            continue
        try:
            if await_timeout_seconds is not None:
                finished = query.awaitTermination(await_timeout_seconds)
                if not finished:
                    query.stop()
                    if not query.awaitTermination(30):
                        raise TimeoutError(
                            "query did not terminate within 30 s of stop(); "
                            "refusing to report a clean stop while it may "
                            "still be writing"
                        )
            else:
                query.awaitTermination()
            report.clean_stop = True
            return report
        except StreamingQueryException as exc:
            register_failure(exc, started_at)
