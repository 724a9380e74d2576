"""Per-epoch fixed-cost breakdown probe (VERDICT r4 #3).

The slope probe (6 vs 15 epochs over the same input) measures the TOTAL
fixed cost per epoch (r4: 0.82 s). This tool shows WHERE it goes: every
micro-batch's `lastProgress.durationMs` from Structured Streaming
(triggerExecution = whole batch; addBatch = the actual job; the rest —
latestOffset/getBatch/queryPlanning/walCommit/commitOffsets — is serial
driver machinery), plus the sink's own driver-side timings.

Run it on the scaling input (generate with tools/bench_scaling.py --prepare
or point --source anywhere):

    python tools/epoch_cost_probe.py --cores 8 \
        --source /tmp/arroyo_spark_scaling/input/turns --epochs 8

Prints one JSON line: per-component median/total milliseconds across
epochs. Non-addBatch time is the per-epoch serial segment that caps
scaling efficiency (Amdahl).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--source", required=True)
    p.add_argument("--epochs", type=int, default=8, help="approx; sets maxFilesPerTrigger")
    p.add_argument("--workdir", default="/tmp/arroyo_spark_epoch_probe")
    args = p.parse_args()

    import glob
    import shutil

    from arroyo_spark.session import get_spark
    from arroyo_spark.streaming import ExactlyOnceSink, FileStreamSource, OffsetsLedger, StreamProcessor
    from arroyo_spark.types import STREAM_SCHEMA
    from jobs import flagship_stream_pipeline

    n_files = len(glob.glob(f"{args.source}/*.parquet"))
    mft = max(1, n_files // args.epochs)
    spark = get_spark("epoch_probe", cores=args.cores, shuffle_partitions=32)
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)

    # wrap the sink to time its own driver-side section per epoch
    sink_times: list[float] = []

    class TimedSink(ExactlyOnceSink):
        def __call__(self, batch_df, epoch_id):
            t0 = time.time()
            super().__call__(batch_df, epoch_id)
            sink_times.append(time.time() - t0)

    ledger = OffsetsLedger(args.workdir, "probe")
    sink = TimedSink(output_dir=f"{args.workdir}/agg", ledger=ledger)
    proc = StreamProcessor(
        spark=spark,
        source=FileStreamSource(args.source, STREAM_SCHEMA, mft),
        sink=sink,
        checkpoint_dir=f"{args.workdir}/ckpt",
        pipeline=lambda df: flagship_stream_pipeline(df, watermark="10 minutes"),
        output_mode="append",
        query_name="probe",
    )

    progresses: list[dict] = []
    q = proc.start()
    while q.isActive:
        q.awaitTermination(1)
        lp = q.lastProgress
        if lp and (not progresses or lp["batchId"] != progresses[-1]["batchId"]):
            progresses.append(lp)
    lp = q.lastProgress
    if lp and (not progresses or lp["batchId"] != progresses[-1]["batchId"]):
        progresses.append(lp)

    comps: dict[str, list[float]] = {}
    for pr in progresses:
        for k, v in (pr.get("durationMs") or {}).items():
            comps.setdefault(k, []).append(float(v))
    out = {
        "cores": args.cores,
        "epochs": len(progresses),
        "mft": mft,
        "per_component_median_ms": {
            k: round(statistics.median(v), 1) for k, v in sorted(comps.items())
        },
        "per_component_total_ms": {k: round(sum(v), 1) for k, v in sorted(comps.items())},
        "serial_overhead_median_ms": round(
            statistics.median(
                [
                    pr["durationMs"]["triggerExecution"] - pr["durationMs"].get("addBatch", 0)
                    for pr in progresses
                    if "durationMs" in pr
                ]
            ),
            1,
        ),
        "sink_driver_median_ms": round(
            statistics.median(sink_times) * 1000 if sink_times else 0.0, 1
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
