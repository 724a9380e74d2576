"""Scaling worker: run the flagship streaming pipeline at a given core count.

Invoked by tools/bench_scaling.py in a fresh process per parallelism level
(one JVM cannot change local[N] after start). Prints one JSON line:
{"cores": N, "elapsed_s": ..., "turns": ..., "turns_per_sec": ...,
 "join_rows": ..., "epochs": ...}
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
    p.add_argument("--cores", type=int, required=True)
    p.add_argument("--source", required=True, help="dir with transcript slices")
    p.add_argument("--calls", required=True, help="dir with tool_call slices")
    p.add_argument("--workdir", required=True)
    # one epoch = 32 files = 32 scan tasks: parquet row groups don't split,
    # so scan parallelism comes from file count (a real broker/Iceberg
    # source brings its own partitioning)
    p.add_argument("--max-files-per-trigger", type=int, default=64)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from arroyo_spark.operators import stream_correlate
    from arroyo_spark.session import get_spark
    from arroyo_spark.streaming import ExactlyOnceSink, FileStreamSource, OffsetsLedger, StreamProcessor
    from arroyo_spark.types import STREAM_SCHEMA, TOOL_CALL_SCHEMA
    from jobs import flagship_stream_pipeline

    # shuffle/state partitioning is a property of the JOB, not the cluster
    # size: keep it fixed (32) at both levels, exactly as a real cluster
    # keeps its partitioning when executors are added. Lower the file-split
    # size so the scan fans out: the default 128m maxPartitionBytes
    # bin-packs the ~12MB stream files into <8 scan tasks, capping the map
    # side at BOTH levels (measured: identical epoch times at 8 vs 32 cores).
    spark = get_spark(
        f"scaling_{args.cores}",
        cores=args.cores,
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    work = f"{args.workdir}/c{args.cores}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    n_turns = spark.read.schema(STREAM_SCHEMA).parquet(args.source).count()

    t0 = time.time()
    # stage 1: watermarked windowed aggregation, exactly-once sink
    ledger = OffsetsLedger(work, "agg")
    sink = ExactlyOnceSink(output_dir=f"{work}/agg", ledger=ledger)
    StreamProcessor(
        spark=spark,
        source=FileStreamSource(args.source, STREAM_SCHEMA, args.max_files_per_trigger),
        sink=sink,
        checkpoint_dir=f"{work}/agg/ckpt",
        pipeline=lambda df: flagship_stream_pipeline(df, watermark="10 minutes"),
        output_mode="append",
    ).run_until_complete()

    # stage 2: stateful turn<->tool-call stream-stream join, exactly-once sink
    ledger2 = OffsetsLedger(work, "join")
    sink2 = ExactlyOnceSink(output_dir=f"{work}/join", ledger=ledger2)
    StreamProcessor(
        spark=spark,
        source=lambda s: stream_correlate(
            FileStreamSource(args.source, STREAM_SCHEMA, args.max_files_per_trigger)(s),
            s.readStream.schema(TOOL_CALL_SCHEMA)
            .option("maxFilesPerTrigger", args.max_files_per_trigger)
            .parquet(args.calls),
            watermark="10 minutes",
            max_call_delay="2 minutes",
        ),
        sink=sink2,
        checkpoint_dir=f"{work}/join/ckpt",
        output_mode="append",
    ).run_until_complete()
    elapsed = time.time() - t0

    join_rows = sink2.read_output(spark).count()
    agg_rows = sink.read_output(spark).count()
    print(
        json.dumps(
            {
                "cores": args.cores,
                "elapsed_s": round(elapsed, 2),
                "turns": n_turns,
                "turns_per_sec": round(n_turns / elapsed, 1),
                "agg_rows": agg_rows,
                "join_rows": join_rows,
                "epochs": len(ledger.epochs()) + len(ledger2.epochs()),
            }
        )
    )


if __name__ == "__main__":
    main()
