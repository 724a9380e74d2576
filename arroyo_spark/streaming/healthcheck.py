"""Healthcheck — liveness probe for streaming queries.

Reference: the Healthcheck strategy touches a file on every poll(),
debounced to 1/s (/root/reference/arroyo/processing/strategies/
healthcheck.py:11-55). Spark mapping: a StreamingQueryListener that
touches the file on every query-progress event — the engine-native
heartbeat, no per-message work.
"""

from __future__ import annotations

import os
import time

from pyspark.sql.streaming import StreamingQueryListener


class HealthcheckListener(StreamingQueryListener):
    def __init__(self, healthcheck_file: str, debounce_s: float = 1.0) -> None:
        self.healthcheck_file = healthcheck_file
        self.debounce_s = debounce_s
        self._last_touch = 0.0

    def _touch(self) -> None:
        now = time.time()
        if now - self._last_touch < self.debounce_s:
            return
        self._last_touch = now
        with open(self.healthcheck_file, "a"):
            os.utime(self.healthcheck_file, None)

    def onQueryStarted(self, event) -> None:
        self._touch()

    def onQueryProgress(self, event) -> None:
        self._touch()

    def onQueryIdle(self, event) -> None:
        self._touch()

    def onQueryTerminated(self, event) -> None:
        pass
