"""C10 liveness / heartbeat monitoring (SURVEY.md §2 C10).

The reference watches its Debezium record queue for signs of a dead or
silent source: an initial first-record wait, a shorter subsequent-record
wait, and a shutdown after enough consecutive empty polls
(`DebeziumRecordIterator.java:42,93-110`, `FirstRecordWaitTimeUtil.java`).

Spark's analog: a StreamingQueryListener.  Each trigger produces either a
progress event (rows processed) or an idle event (no data available) —
the watchdog counts consecutive no-data triggers and flags a stall.  The
job wrapper then stops the query and raises, instead of letting a dead
tail sit "running" forever while replicating nothing.
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener


class StalledStreamError(RuntimeError):
    """The source produced no data for the configured number of consecutive
    triggers (C10 empty-poll shutdown,
    `DebeziumRecordIterator.java:93-110`)."""


class LivenessWatchdog(StreamingQueryListener):
    """Counts consecutive no-data triggers per query.

    ``max_empty_polls`` mirrors the reference's consecutive-empty-poll
    shutdown; the wall-clock ``stall_after_sec`` fallback covers triggers
    that emit no event at all (the first-record wait analog: a source that
    never produces anything still trips the clock)."""

    def __init__(self, max_empty_polls: int = 10, stall_after_sec: float | None = None):
        self.max_empty_polls = max_empty_polls
        self.stall_after_sec = stall_after_sec
        self._empty: dict[str, int] = {}
        self._stalled: dict[str, bool] = {}
        self._last_data: dict[str, float] = {}

    # -- listener callbacks (called from Spark's listener-bus thread) -------

    def onQueryStarted(self, event) -> None:
        qid = str(event.id)
        self._empty[qid] = 0
        self._stalled[qid] = False
        self._last_data[qid] = time.monotonic()

    def onQueryProgress(self, event) -> None:
        qid = str(event.progress.id)
        if event.progress.numInputRows > 0:
            self._empty[qid] = 0
            self._last_data[qid] = time.monotonic()
        else:
            self._bump(qid)

    def onQueryIdle(self, event) -> None:
        # Spark emits idle (not progress) events for no-data triggers
        self._bump(str(event.id))

    def onQueryTerminated(self, event) -> None:
        qid = str(event.id)
        self._empty.pop(qid, None)
        self._last_data.pop(qid, None)

    def _bump(self, qid: str) -> None:
        n = self._empty.get(qid, 0) + 1
        self._empty[qid] = n
        if n >= self.max_empty_polls:
            self._stalled[qid] = True

    # -- polling surface -----------------------------------------------------

    def is_stalled(self, query_id: str) -> bool:
        qid = str(query_id)
        if self._stalled.get(qid):
            return True
        if self.stall_after_sec is None:
            return False
        # self-priming: if the started event never reached us, the first
        # poll starts the clock — a totally silent source still trips it
        last = self._last_data.setdefault(qid, time.monotonic())
        return time.monotonic() - last > self.stall_after_sec

    def empty_polls(self, query_id: str) -> int:
        return self._empty.get(str(query_id), 0)


def await_with_liveness(
    spark,
    query,
    watchdog: LivenessWatchdog,
    timeout_sec: float,
    poll_sec: float = 0.2,
) -> None:
    """Block on a continuous query while the watchdog runs; on stall, stop
    the query and raise StalledStreamError.  Returns normally if the query
    terminates on its own within the timeout (exceptions re-raised)."""
    deadline = time.monotonic() + timeout_sec
    try:
        while time.monotonic() < deadline:
            if not query.isActive:
                if query.exception() is not None:
                    raise RuntimeError(str(query.exception()))
                return
            if watchdog.is_stalled(query.id):
                query.stop()
                raise StalledStreamError(
                    f"stream {query.id} produced no data for "
                    f"{watchdog.empty_polls(query.id)} consecutive triggers "
                    "— source presumed dead (C10); stopping instead of "
                    "idling forever"
                )
            time.sleep(poll_sec)
        raise TimeoutError(f"query still active after {timeout_sec}s")
    finally:
        spark.streams.removeListener(watchdog)
