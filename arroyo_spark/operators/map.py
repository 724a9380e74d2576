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


# column that carries a mid-pipeline InvalidMessage reason (null = valid).
# The reference raises InvalidMessage(partition, offset) from ANY strategy
# and the DLQ produces the ORIGINAL raw message
# (/root/reference/arroyo/dlq.py:36-77, buffered originals :280-364).
# Spark mapping: transforms write results to NEW columns, keep the original
# payload column untouched, and record failures here; the exactly-once sink
# routes reason-carrying rows (originals intact) to the DLQ while the epoch
# still commits.
INVALID_REASON_COL = "_invalid_reason"


def run_task_safe(
    df: DataFrame,
    fn: Callable[["pd.DataFrame"], "pd.DataFrame"],
    out_cols: dict[str, str],
) -> DataFrame:
    """RunTask with InvalidMessage capture (the reference's poison-row path).

    ``fn`` maps an input pandas batch to a frame with columns ``out_cols``
    (name -> spark type). Fast path: one call per Arrow batch. If the batch
    raises, the batch is BISECTED: each half retries as a whole, recursing
    until single rows — failing rows get null outputs and their exception
    recorded in ``_invalid_reason``; all ORIGINAL input columns pass through
    unchanged, so the DLQ receives the original payload, not a
    half-transformed one.

    ``fn`` MUST be pure (no side effects): rows sharing a batch with a
    poison row are re-executed during bisection (each healthy row at most
    O(log batch) times, vs O(1 whole-batch + n single-row) calls under the
    old per-row fallback).
    """
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    extra = ", ".join(f"{name} {typ}" for name, typ in out_cols.items())
    out_schema = f"{in_schema}, {extra}, {INVALID_REASON_COL} string"
    names = list(out_cols)

    def _apply(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def _run(pdf: "pd.DataFrame") -> tuple[dict[str, list], list]:
            """(out_col -> values, reasons) for pdf, bisecting on failure."""
            try:
                res = fn(pdf)
                vals = {
                    n: list(res[n].to_numpy() if hasattr(res[n], "to_numpy") else res[n])
                    for n in names
                }
                return vals, [None] * len(pdf)
            except Exception as e:  # noqa: BLE001
                if len(pdf) <= 1:
                    return {n: [None] * len(pdf) for n in names}, [
                        f"{type(e).__name__}: {e}"
                    ] * len(pdf)
                mid = len(pdf) // 2
                lv, lr = _run(pdf.iloc[:mid].reset_index(drop=True))
                rv, rr = _run(pdf.iloc[mid:].reset_index(drop=True))
                return {n: lv[n] + rv[n] for n in names}, lr + rr

        for pdf in batches:
            out = pdf.copy()
            try:
                res = fn(pdf)
                for n in names:
                    out[n] = res[n].to_numpy() if hasattr(res[n], "to_numpy") else res[n]
                out[INVALID_REASON_COL] = None
            except Exception:
                # poison batch: bisect to isolate the failing rows (reference
                # analog: InvalidMessage identifies a single original offset)
                vals, reasons = _run(pdf.reset_index(drop=True))
                for n in names:
                    out[n] = pd.Series(vals[n], dtype="object")
                out[INVALID_REASON_COL] = reasons
            yield out

    return df.mapInPandas(_apply, schema=out_schema)
