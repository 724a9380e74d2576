"""Stuck detector — watchdog for a wedged micro-batch.

Reference contract (/root/reference/arroyo/utils/stuck_detector.py:1-58,
/root/reference/arroyo/processing/processor.py:370-392): a daemon thread
watches the main loop's last-activity timestamp; if it goes stale past a
timeout it dumps every thread's stack and increments
``arroyo.consumer.stuck``.

Spark mapping: activity = StreamingQueryListener events. A HEALTHY query
emits either progress (batch finished) or idle (no data) events
continuously; a wedged micro-batch — executor deadlock, hung UDF, stuck
external call — emits NOTHING. So the detector keeps a per-query
last-event timestamp, and a watchdog (driven by ``check()``, either from
the daemon thread here or an external prober) flags any active query whose
gap exceeds the timeout: Python thread stacks are dumped to
``<stuck_file>`` and the ``arroyo.consumer.stuck`` count goes up. A later
event from the query clears the flag (recovery) — the stuck file is left
in place as evidence.

The clock is injectable so the staleness logic is testable without
wall-clock sleeps; the thread is a thin loop over ``check()``.
"""

from __future__ import annotations

import sys
import threading
import time
import traceback

from pyspark.sql.streaming import StreamingQueryListener


def all_thread_stacks() -> str:
    """Format current stacks of every Python thread (driver side)."""
    frames = sys._current_frames()
    by_id = {t.ident: t for t in threading.enumerate()}
    out = []
    for tid, frame in frames.items():
        t = by_id.get(tid)
        name = t.name if t else f"unknown-{tid}"
        out.append(f"Thread {name} ({tid}):\n" + "".join(traceback.format_stack(frame)))
    return "\n\n".join(out)


class StuckDetector(StreamingQueryListener):
    """Progress-gap watchdog. Register with ``spark.streams.addListener``.

    ``stuck_file``: where stacks + diagnostics are dumped on detection —
    the unhealthy marker a liveness probe should watch alongside the
    healthcheck file's mtime going stale.
    """

    def __init__(
        self,
        timeout_s: float,
        stuck_file: str,
        clock=time.time,
        poll_interval_s: float = 1.0,
    ) -> None:
        self.timeout_s = timeout_s
        self.stuck_file = stuck_file
        self.clock = clock
        self.poll_interval_s = poll_interval_s
        self._last_event: dict[str, float] = {}  # query id -> last activity
        self._stuck: set[str] = set()
        self.n_stuck_detected = 0  # the arroyo.consumer.stuck counter
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- listener events = activity ------------------------------------
    def _touch(self, event) -> None:
        qid = str(event.id)
        with self._lock:
            self._last_event[qid] = self.clock()
            self._stuck.discard(qid)  # recovered (stuck file stays as evidence)

    def onQueryStarted(self, event) -> None:
        self._touch(event)

    def onQueryProgress(self, event) -> None:
        self._touch(event.progress)

    def onQueryIdle(self, event) -> None:
        # idle is HEALTHY: the query polled, found nothing. Only silence
        # (a batch that never finishes) is stuck.
        self._touch(event)

    def onQueryTerminated(self, event) -> None:
        qid = str(event.id)
        with self._lock:
            self._last_event.pop(qid, None)
            self._stuck.discard(qid)

    # -- watchdog -------------------------------------------------------
    def check(self) -> list[str]:
        """Flag queries whose event gap exceeds the timeout; returns newly
        stuck query ids (each dumps stacks once until it recovers)."""
        now = self.clock()
        newly = []
        with self._lock:
            for qid, last in self._last_event.items():
                if now - last > self.timeout_s and qid not in self._stuck:
                    self._stuck.add(qid)
                    self.n_stuck_detected += 1
                    newly.append(qid)
        for qid in newly:
            self._dump(qid, now)
        return newly

    def is_stuck(self) -> bool:
        with self._lock:
            return bool(self._stuck)

    def _dump(self, qid: str, now: float) -> None:
        with open(self.stuck_file, "a") as f:
            f.write(
                f"=== stuck query {qid}: no listener event for > "
                f"{self.timeout_s}s (now={now}) ===\n{all_thread_stacks()}\n"
            )

    def start(self) -> None:
        """Spawn the daemon watchdog thread (reference: processor.py:370)."""

        def loop() -> None:
            while not self._stop.wait(self.poll_interval_s):
                self.check()

        self._thread = threading.Thread(target=loop, daemon=True, name="stuck-detector")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
