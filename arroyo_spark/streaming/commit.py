"""Commit-policy semantics (offset-commit throttling).

Observable contract reproduced from the reference
(/root/reference/arroyo/commit.py:10-58, goldens at
/root/reference/tests/processing/test_processor.py:380-515):

- ``should_commit(now, offsets)`` is True when EITHER the elapsed time since
  the last commit reaches ``min_commit_frequency_sec`` OR the summed offset
  delta across partitions (first sight of a partition counts as delta 1)
  reaches ``min_commit_messages``.
- ``offsets`` maps partition -> NEXT offset to read (offset+1), never the
  consumed offset.

In the Spark engine this throttles how often the exactly-once sink flushes
its ledger rows relative to micro-batches: the ledger MERGE always happens
per epoch (exactly-once needs it), but ledger *checkpointing granularity*
and the trigger interval are tuned by the same policy values
(IMMEDIATE -> per-epoch, ONCE_PER_SECOND -> 1s trigger).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, MutableMapping, Optional


@dataclass(frozen=True)
class CommitPolicy:
    min_commit_frequency_sec: Optional[float]
    min_commit_messages: Optional[int]

    def __post_init__(self) -> None:
        if self.min_commit_frequency_sec is None and self.min_commit_messages is None:
            raise ValueError(
                "Must provide either min_commit_frequency_sec or min_commit_messages"
            )

    def get_state_machine(self, now: float | None = None) -> "CommitPolicyState":
        """State machine clocked from ``now`` (default: wall clock at
        creation — the reference initializes __last_committed_time to
        time.time(), so a frequency-only policy waits a full interval
        before its first commit)."""
        import time

        return CommitPolicyState(self, _last_committed_time=time.time() if now is None else now)

    def trigger_interval(self) -> str | None:
        """Suggested streaming trigger for this policy (None = as-fast-as-possible)."""
        if self.min_commit_frequency_sec:
            return f"{int(self.min_commit_frequency_sec * 1000)} milliseconds"
        return None


@dataclass
class CommitPolicyState:
    policy: CommitPolicy
    _committed_offsets: MutableMapping[int, int] = field(default_factory=dict)
    _last_committed_time: float = 0.0

    def should_commit(self, now: float, offsets: Mapping[int, int]) -> bool:
        if self.policy.min_commit_frequency_sec is not None:
            if now - self._last_committed_time >= self.policy.min_commit_frequency_sec:
                return True
        if self.policy.min_commit_messages is not None:
            messages_since = 0
            for partition, pos in offsets.items():
                prev = self._committed_offsets.setdefault(partition, pos - 1)
                messages_since += pos - prev
            if messages_since >= self.policy.min_commit_messages:
                return True
        return False

    def did_commit(self, now: float, offsets: Mapping[int, int]) -> None:
        self._last_committed_time = now
        self._committed_offsets.update(offsets)


IMMEDIATE = CommitPolicy(None, 1)
ONCE_PER_SECOND = CommitPolicy(1, None)
