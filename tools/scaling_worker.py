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
    p.add_argument("--max-files-per-trigger", type=int, default=128)
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
    extra_conf = {
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
        # don't let AQE coalesce per-epoch output writes into one task —
        # a single-task write is a serial segment every epoch
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
    }
    # experiment knobs: SCALING_CONF="k=v;k=v"
    for kv in os.environ.get("SCALING_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra_conf[k.strip()] = v.strip()
    # SCALING_FAIR=1: FAIR scheduler with one pool per streaming query.
    # Under the default FIFO scheduler the two concurrent queries' stages
    # queue behind each other (measured: join b1 triggerExecution 51.6s vs
    # addBatch 7.2s while agg b1 held all cores — BENCH/BASELINE.md); FAIR
    # pools interleave their tasks so the join's state-store I/O waits
    # overlap the agg's compute. This is the documented deployment shape
    # for multiple streaming queries sharing one cluster.
    fair = os.environ.get("SCALING_FAIR", "0") == "1"
    if fair:
        extra_conf["spark.scheduler.mode"] = "FAIR"
    spark = get_spark(
        f"scaling_{args.cores}",
        cores=args.cores,
        shuffle_partitions=int(os.environ.get("SCALING_SHUFFLE", "32")),
        extra_conf=extra_conf,
    )
    work = f"{args.workdir}/c{args.cores}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    n_turns = spark.read.schema(STREAM_SCHEMA).parquet(args.source).count()

    # warm codegen/JIT before timing (identical cost at every level; the
    # first micro-batch otherwise carries ~10-15s of one-time compilation
    # that skews the throughput ratio): run both pipelines in BATCH mode
    # over one input slice each
    import glob as _glob

    warm_turns = spark.read.schema(STREAM_SCHEMA).parquet(
        sorted(_glob.glob(f"{args.source}/*.parquet"))[0]
    )
    warm_calls = spark.read.schema(TOOL_CALL_SCHEMA).parquet(
        sorted(_glob.glob(f"{args.calls}/*.parquet"))[0]
    )
    flagship_stream_pipeline(warm_turns).count()
    stream_correlate(warm_turns, warm_calls).count()

    t0 = time.time()
    # The two queries run CONCURRENTLY in one session — the standard
    # deployment shape (a real cluster runs many consumers of the same
    # stream at once, and Structured Streaming schedules their micro-batches
    # cooperatively). It is also what makes the job scale: the windowed agg
    # is CPU-bound while the stream-stream join is state-store-latency-bound
    # (measured ~8 busy cores at local[16] when run alone) — concurrent
    # execution overlaps the join's I/O waits under the agg's compute.
    # query 1: watermarked windowed aggregation, exactly-once sink
    ledger = OffsetsLedger(work, "agg")
    sink = ExactlyOnceSink(output_dir=f"{work}/agg", ledger=ledger)
    proc1 = StreamProcessor(
        spark=spark,
        source=FileStreamSource(args.source, STREAM_SCHEMA, args.max_files_per_trigger),
        sink=sink,
        checkpoint_dir=f"{work}/agg/ckpt",
        pipeline=lambda df: flagship_stream_pipeline(df, watermark="10 minutes"),
        output_mode="append",
        query_name="agg",
        scheduler_pool="agg" if fair else None,
    )

    # query 2: stateful turn<->tool-call stream-stream join, exactly-once sink
    ledger2 = OffsetsLedger(work, "join")
    sink2 = ExactlyOnceSink(output_dir=f"{work}/join", ledger=ledger2)
    proc2 = StreamProcessor(
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
        query_name="join",
        scheduler_pool="join" if fair else None,
    )

    # pool-per-query FAIR scheduling is now a StreamProcessor feature
    # (scheduler_pool=...); with spark.scheduler.mode=FAIR the root
    # schedules pools fair-share, so neither query's stages starve
    # behind the other's.
    q1 = proc1.start()
    q2 = proc2.start()
    q1.awaitTermination()
    t_stage1 = time.time() - t0
    q2.awaitTermination()
    elapsed = time.time() - t0

    join_rows = sink2.read_output(spark).count()
    agg_rows = sink.read_output(spark).count()
    print(
        json.dumps(
            {
                "cores": args.cores,
                "fair": fair,
                "elapsed_s": round(elapsed, 2),
                "agg_drained_s": round(t_stage1, 2),
                "join_drained_s": round(elapsed, 2),
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
