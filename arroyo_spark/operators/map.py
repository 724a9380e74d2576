"""Map operators — the RunTask family.

Reference semantics (observable contract only):
- RunTask applies ``function`` to each message payload and forwards the
  result, preserving committable/timestamp
  (/root/reference/arroyo/processing/strategies/run_task.py:14-113).
- RunTaskInThreads / RunTaskWithMultiprocessing are the same map with
  IO-thread / CPU-process parallelism and batched shared-memory transfer
  (/root/reference/arroyo/processing/strategies/run_task_with_multiprocessing.py:380-973).

Spark mapping: a map is a projection. The 973-line multiprocessing machine
collapses into Arrow-batched execution that Spark already performs:
- JVM path (preferred): ``run_task`` with built-in column expressions —
  whole-stage codegen, zero Python.
- Python path (when semantics genuinely need Python): ``run_task_pandas``
  — a vectorized ``mapInPandas`` where Arrow plays the role of the
  reference's pickle-5 + SharedMemory blocks and
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` plays ``max_batch_size``.

Backpressure (``MessageRejected``), carried-message retry, and block
resizing have no analog here by design: Spark's pull-based scheduling and
Arrow streaming subsume them (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame

if TYPE_CHECKING:
    import pandas as pd


def run_task(df: DataFrame, **cols: Column) -> DataFrame:
    """Apply column transforms; non-mentioned columns pass through unchanged.

    ``run_task(df, text=normalize_text("text"))`` is the engine's
    ``RunTask(lambda msg: msg.replace(normalize(msg.payload)))``.
    """
    return df.withColumns(cols)


def run_task_pandas(
    df: DataFrame,
    fn: Callable[["pd.DataFrame"], "pd.DataFrame"],
    schema: str | None = None,
) -> DataFrame:
    """Arrow-batched per-batch transform (RunTaskWithMultiprocessing analog).

    ``fn`` receives/returns pandas DataFrames; output schema defaults to the
    input schema (payload-replace semantics). Runs in Spark's Python workers
    with Arrow transfer — batch-parallel across all partitions.
    """
    out_schema = schema or df.schema

    def _apply(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_apply, schema=out_schema)
