"""Bounded retries for driver-side filesystem effects.

Reference contract (/root/reference/arroyo/utils/retries.py:1-101): a
``RetryPolicy.call(fn)`` invokes ``fn`` until it succeeds or the attempt
budget is spent, with an optional inter-attempt delay and an optional
test restricting which exceptions are retryable; exhaustion raises
``RetryException`` chaining the last error.

Spark split of responsibilities: COMPUTE failures are already retried by
the task scheduler (``spark.task.maxFailures``) — wrapping them here would
double-retry. This policy exists for the sink's DRIVER-side effects (epoch
parquet dirs, DLQ dirs, ledger commits): every one is an idempotent
overwrite/atomic-rename, so a transient FS hiccup is safely retryable —
without it one EIO fails the epoch even though an immediate replay would
succeed.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import TypeVar

T = TypeVar("T")


class RetryException(Exception):
    """Attempt budget exhausted; ``__cause__`` is the last error."""


@dataclass
class RetryPolicy:
    attempts: int = 3
    delay_s: float = 0.2
    # None = every Exception is retryable; else only those passing the test
    retryable: Callable[[Exception], bool] | None = None
    sleep: Callable[[float], None] = field(default=time.sleep, repr=False)

    def call(self, fn: Callable[[], T]) -> T:
        for attempt in range(1, self.attempts + 1):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — policy decides
                if self.retryable is not None and not self.retryable(e):
                    raise
                if attempt == self.attempts:
                    raise RetryException(
                        f"failed after {self.attempts} attempts: {type(e).__name__}: {e}"
                    ) from e
                if self.delay_s:
                    self.sleep(self.delay_s)
        raise AssertionError("unreachable")


NO_RETRY = RetryPolicy(attempts=1, delay_s=0.0)
