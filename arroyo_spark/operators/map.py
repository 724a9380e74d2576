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
    raises, falls back to row-at-a-time within that batch only — failing
    rows get null outputs and their exception recorded in
    ``_invalid_reason``; all ORIGINAL input columns pass through unchanged,
    so the DLQ receives the original payload, not a half-transformed one.
    """
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    extra = ", ".join(f"{name} {typ}" for name, typ in out_cols.items())
    out_schema = f"{in_schema}, {extra}, {INVALID_REASON_COL} string"
    names = list(out_cols)

    def _apply(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            try:
                res = fn(pdf)
                for n in names:
                    out[n] = res[n].to_numpy() if hasattr(res[n], "to_numpy") else res[n]
                out[INVALID_REASON_COL] = None
            except Exception:
                # poison batch: isolate the failing rows (reference analog:
                # InvalidMessage identifies a single original offset)
                vals: dict[str, list] = {n: [] for n in names}
                reasons: list[str | None] = []
                for i in range(len(pdf)):
                    row = pdf.iloc[i : i + 1].reset_index(drop=True)
                    try:
                        r = fn(row)
                        for n in names:
                            vals[n].append(r[n].iloc[0] if hasattr(r[n], "iloc") else r[n])
                        reasons.append(None)
                    except Exception as e:  # noqa: BLE001
                        for n in names:
                            vals[n].append(None)
                        reasons.append(f"{type(e).__name__}: {e}")
                for n in names:
                    out[n] = pd.Series(vals[n], dtype="object")
                out[INVALID_REASON_COL] = reasons
            yield out

    return df.mapInPandas(_apply, schema=out_schema)
