"""Generic stateful Buffer — the applyInPandasWithState port of arroyo #6.

Reference: Buffer holds messages until a pluggable BufferProtocol says
is_ready ("message count, buffer size, ... phase of the moon"), then
flushes one value downstream
(/root/reference/arroyo/processing/strategies/buffer.py:66-191); Reduce is
the count+time specialization (reduce.py:15-66).

Spark mapping: keyed state across micro-batches. The buffer lives in the
state store (checkpointed — survives restart, unlike the reference's
in-memory buffer which re-reads from the last committed offset); flush
readiness is (a) count threshold, checked on every batch, and (b) a
processing-time timeout, exactly arroyo's max_batch_size/max_batch_time
pair. join()-style force-flush happens on timeout after the stream drains.

Use the windowed aggregations (operators.reduce) whenever the fold is
expressible with built-in aggregates — this operator is for genuinely
custom accumulators only (it keeps raw rows in state).
"""

from __future__ import annotations

import pickle
from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [T.StructField("buf", T.BinaryType()), T.StructField("n", T.LongType())]
)


def stateful_buffer(
    df: DataFrame,
    keys: list[str],
    fold: Callable[[tuple, "pd.DataFrame"], dict[str, Any]],
    out_schema: str | T.StructType,
    max_batch_size: int = 1000,
    max_batch_time_s: float | None = 10.0,
) -> DataFrame:
    """Buffer rows per key; emit fold(key, buffered_rows) as one output row
    when the count threshold is reached or the processing-time timeout fires.

    ``fold`` returns a dict of column -> value matching ``out_schema``.
    """

    def handle(
        key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
    ) -> Iterable["pd.DataFrame"]:
        if state.hasTimedOut:
            buf_b, _ = state.get
            state.remove()
            buffered = pickle.loads(buf_b)
            if len(buffered):
                yield pd.DataFrame([fold(key, buffered)])
            return

        new_rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            buf_b, _ = state.get
            buffered = pd.concat([pickle.loads(buf_b), new_rows], ignore_index=True)
        else:
            buffered = new_rows

        out = []
        while len(buffered) >= max_batch_size:
            batch, buffered = buffered.iloc[:max_batch_size], buffered.iloc[max_batch_size:]
            out.append(fold(key, batch))
        buffered = buffered.reset_index(drop=True)

        if len(buffered):
            state.update((pickle.dumps(buffered), len(buffered)))
            if max_batch_time_s is not None:
                state.setTimeoutDuration(int(max_batch_time_s * 1000))
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if max_batch_time_s is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*keys).applyInPandasWithState(
        handle, out_schema, STATE_SCHEMA, "append", timeout
    )
