"""Per-query profiler — the reference's cProfile strategy wrapper, Spark-first.

Reference (/root/reference/arroyo/utils/profiler.py:16-58): wraps a
ProcessingStrategy in cProfile and dumps the stats file when the strategy
closes. In this engine the per-message work runs on executors inside the
JVM (or Arrow workers), so a driver-side cProfile would profile nothing but
Py4J waits. The faithful equivalent is the engine's own instrumentation,
captured at the same two granularities the reference dump gives you:

- per EPOCH: every StreamingQueryProgress (micro-batch phase breakdown in
  ``durationMs`` — addBatch/getBatch/queryPlanning/walCommit/commitOffsets
  — plus rows, per-source offsets and state-store operator metrics),
  accumulated by a ``StreamingQueryListener``;
- per STAGE: task-time totals (executorRunTime / executorCpuTime, I/O and
  shuffle bytes) snapshotted from the JVM ``AppStatusStore`` — the same
  store the Spark UI reads, available headless (spark.ui.enabled=false).

``QueryProfiler`` dumps one JSON file per query when the query terminates
(the "on close" contract of the reference profiler).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.streaming import StreamingQueryListener


def stage_metrics(spark) -> list[dict]:
    """Per-stage task-time snapshot from the JVM AppStatusStore.

    Works with the UI disabled: the status store is populated regardless —
    this is ``/api/v1/.../stages`` without an HTTP server. Fields are the
    totals across the stage's tasks; executor_run_time_ms is the "task
    time" column of the UI's stage table.
    """
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    no_quantiles = gw.new_array(gw.jvm.double, 0)
    stages = store.stageList(None, False, False, no_quantiles, None)
    out = []
    for i in range(stages.size()):
        s = stages.apply(i)
        out.append(
            {
                "stage_id": s.stageId(),
                "attempt": s.attemptId(),
                "status": str(s.status()),
                "name": s.name(),
                "num_tasks": s.numTasks(),
                "num_complete_tasks": s.numCompleteTasks(),
                "num_failed_tasks": s.numFailedTasks(),
                "executor_run_time_ms": s.executorRunTime(),
                "executor_cpu_time_ms": s.executorCpuTime() // 1_000_000,
                "input_bytes": s.inputBytes(),
                "input_records": s.inputRecords(),
                "output_bytes": s.outputBytes(),
                "shuffle_read_bytes": s.shuffleReadBytes(),
                "shuffle_write_bytes": s.shuffleWriteBytes(),
                "memory_spilled_bytes": s.memoryBytesSpilled(),
                "disk_spilled_bytes": s.diskBytesSpilled(),
            }
        )
    return out


class QueryProfiler(StreamingQueryListener):
    """Accumulate per-epoch progress for every query and dump a JSON
    profile on termination (``<dump_dir>/<query_name>.profile.json``).

    Register once per session::

        prof = QueryProfiler(dump_dir, spark=spark)
        spark.streams.addListener(prof)

    ``spark`` is optional; when given, the dump also includes the
    per-stage task-time snapshot (``stage_metrics``) taken at termination
    — stage totals are session-wide, which in the single-query case is
    exactly the query's own work (noted in the dump either way).
    """

    def __init__(self, dump_dir: str, spark=None, clock=time.time) -> None:
        self.dump_dir = dump_dir
        self.spark = spark
        self.clock = clock
        self._by_id: dict[str, dict] = {}

    # -- listener events -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self._by_id[str(event.id)] = {
            "query_id": str(event.id),
            "run_id": str(event.runId),
            "name": event.name,
            "started_at": self.clock(),
            "epochs": [],
        }

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        rec = self._by_id.setdefault(
            str(p.get("id")),
            {"query_id": str(p.get("id")), "name": p.get("name"), "epochs": []},
        )
        rec["epochs"].append(
            {
                "batch_id": p.get("batchId"),
                "timestamp": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows"),
                "duration_ms": p.get("durationMs", {}),
                "state_operators": [
                    {
                        "operator": so.get("operatorName"),
                        "rows_total": so.get("numRowsTotal"),
                        "rows_updated": so.get("numRowsUpdated"),
                        "memory_used_bytes": so.get("memoryUsedBytes"),
                    }
                    for so in p.get("stateOperators", [])
                ],
                "observed_metrics": p.get("observedMetrics", {}),
            }
        )

    def onQueryIdle(self, event) -> None:  # no batch ran — nothing to record
        pass

    def onQueryTerminated(self, event) -> None:
        rec = self._by_id.pop(str(event.id), None)
        if rec is None:
            return
        rec["terminated_at"] = self.clock()
        rec["exception"] = event.exception
        epochs = rec["epochs"]
        rec["totals"] = {
            "n_epochs": len(epochs),
            "input_rows": sum(e["num_input_rows"] or 0 for e in epochs),
            "trigger_ms": sum(
                (e["duration_ms"] or {}).get("triggerExecution", 0) for e in epochs
            ),
            "add_batch_ms": sum(
                (e["duration_ms"] or {}).get("addBatch", 0) for e in epochs
            ),
        }
        if self.spark is not None:
            try:
                rec["stages"] = stage_metrics(self.spark)
                rec["stages_note"] = (
                    "session-wide stage totals snapshotted at query termination"
                )
            except Exception as e:  # noqa: BLE001 — profiling must not kill the app
                rec["stages_error"] = repr(e)
        self._dump(rec)

    # -- dump ------------------------------------------------------------
    def _path(self, rec: dict) -> str:
        name = rec.get("name") or rec["query_id"]
        return os.path.join(self.dump_dir, f"{name}.profile.json")

    def _dump(self, rec: dict) -> None:
        os.makedirs(self.dump_dir, exist_ok=True)
        path = self._path(rec)
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, path)
