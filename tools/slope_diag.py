"""Diagnose the r5 slope anomaly: where do the extra seconds per trigger go?

The r5 gated slope probe read 35.6 s/epoch (mft 128 -> 42: 449 -> 734 s),
vs r4's 0.82 s/epoch — yet the streaming machinery outside addBatch
measures 0.24 s/epoch. This tool runs the SAME two concurrent queries as
tools/scaling_worker.py at one mft and prints, per micro-batch and per
query: durationMs components AND stateOperators (numRowsTotal, commit
times, state memory), so the per-trigger cost can be attributed to state
checkpointing vs shuffle vs planning.

    python tools/slope_diag.py --cores 8 --mft 42
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--mft", type=int, default=42)
    p.add_argument("--source", default="/tmp/arroyo_spark_scaling/input/turns")
    p.add_argument("--calls", default="/tmp/arroyo_spark_scaling/input/calls")
    p.add_argument("--workdir", default="/tmp/arroyo_spark_slope_diag")
    p.add_argument("--agg-only", action="store_true")
    args = p.parse_args()

    from arroyo_spark.operators import stream_correlate
    from arroyo_spark.session import get_spark
    from arroyo_spark.streaming import ExactlyOnceSink, FileStreamSource, OffsetsLedger, StreamProcessor
    from arroyo_spark.types import STREAM_SCHEMA, TOOL_CALL_SCHEMA
    from jobs import flagship_stream_pipeline

    extra_conf = {
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
    }
    spark = get_spark(f"slope_diag_{args.mft}", cores=args.cores,
                      shuffle_partitions=32, extra_conf=extra_conf)
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)

    procs = []
    ledger = OffsetsLedger(args.workdir, "agg")
    sink = ExactlyOnceSink(output_dir=f"{args.workdir}/agg", ledger=ledger)
    procs.append(("agg", StreamProcessor(
        spark=spark,
        source=FileStreamSource(args.source, STREAM_SCHEMA, args.mft),
        sink=sink,
        checkpoint_dir=f"{args.workdir}/agg/ckpt",
        pipeline=lambda df: flagship_stream_pipeline(df, watermark="10 minutes"),
        output_mode="append", query_name="agg",
    )))
    if not args.agg_only:
        ledger2 = OffsetsLedger(args.workdir, "join")
        sink2 = ExactlyOnceSink(output_dir=f"{args.workdir}/join", ledger=ledger2)
        procs.append(("join", StreamProcessor(
            spark=spark,
            source=lambda s: stream_correlate(
                FileStreamSource(args.source, STREAM_SCHEMA, args.mft)(s),
                s.readStream.schema(TOOL_CALL_SCHEMA)
                .option("maxFilesPerTrigger", args.mft).parquet(args.calls),
                watermark="10 minutes", max_call_delay="2 minutes",
            ),
            sink=sink2,
            checkpoint_dir=f"{args.workdir}/join/ckpt",
            output_mode="append", query_name="join",
        )))

    t0 = time.time()
    queries = [(name, pr.start()) for name, pr in procs]
    seen: dict[str, set] = {name: set() for name, _ in queries}
    batches: list[dict] = []
    while any(q.isActive for _, q in queries):
        time.sleep(1)
        for name, q in queries:
            lp = q.lastProgress
            if lp and lp["batchId"] not in seen[name]:
                seen[name].add(lp["batchId"])
                rec = {
                    "q": name, "batch": lp["batchId"],
                    "rows": lp.get("numInputRows"),
                    "dur": lp.get("durationMs"),
                    "state": [
                        {k: so.get(k) for k in (
                            "numRowsTotal", "numRowsUpdated", "numRowsRemoved",
                            "commitTimeMs", "memoryUsedBytes",
                            "numStateStoreInstances")}
                        for so in lp.get("stateOperators", [])
                    ],
                }
                batches.append(rec)
                print(json.dumps(rec), flush=True)
    elapsed = time.time() - t0
    print(json.dumps({"elapsed_s": round(elapsed, 2), "mft": args.mft,
                      "cores": args.cores, "batches": len(batches)}), flush=True)


if __name__ == "__main__":
    main()
