"""CommitPolicy goldens — ported from the reference's observable contract.

Reference: /root/reference/tests/processing/test_processor.py:380-515 and
/root/reference/arroyo/commit.py:10-58. Partitions are plain ints here
(topic identity is carried by the ledger's job_id in our engine).
"""

from __future__ import annotations

import pytest

from arroyo_spark.streaming import IMMEDIATE, CommitPolicy


def run_policy(messages, policy):
    """messages: list of (now, {partition: offset}) — offsets are consumed
    offsets; committable = offset+1 (next-offset contract).

    The state machine is created an instant AFTER the first message's
    timestamp, exactly as in the reference test (the processor builds the
    policy state at assignment time, after datetime.now() stamped the
    messages) — this is what makes the elapsed-time golden [0,0,0,1,1,2,2].
    """
    state = policy.get_state_machine(now=(messages[0][0] + 1e-3) if messages else 0.0)
    commits = 0
    out = []
    for now, offsets in messages:
        committable = {p: o + 1 for p, o in offsets.items()}
        if state.should_commit(now, committable):
            state.did_commit(now, committable)
            commits += 1
        out.append(commits)
    return out


def test_commit_every_second_message():
    msgs = [(0.0, {0: o}) for o in (0, 1, 2, 5, 10)]
    assert run_policy(msgs, CommitPolicy(None, 2)) == [0, 1, 1, 2, 3]


def test_commit_policy_multiple_partitions():
    msgs = [(0.0, {0: 200}), (0.0, {1: 400}), (0.0, {0: 400}), (0.0, {1: 400})]
    assert run_policy(msgs, CommitPolicy(None, 2)) == [0, 0, 1, 1]


def test_commit_policy_immediate_first_message():
    assert run_policy([(0.0, {0: 200})], IMMEDIATE) == [1]


def test_commit_policy_every_two_seconds():
    msgs = [(float(i), {0: i}) for i in range(7)]
    assert run_policy(msgs, CommitPolicy(2, None)) == [0, 0, 0, 1, 1, 2, 2]


def test_policy_requires_a_threshold():
    with pytest.raises(ValueError):
        CommitPolicy(None, None)


def test_trigger_interval_mapping():
    assert CommitPolicy(1, None).trigger_interval() == "1000 milliseconds"
    assert IMMEDIATE.trigger_interval() is None
