"""Streaming-CEP scale certification (VERDICT r4 #6).

The stateful CEP operators (streaming/cep.py) are correctness-tested at
toy scale; this probe runs ONE of them — stateful_match_sequence over the
user->assistant->tool funnel — on the full scaling input (~33M turns) and
records what the correctness tests cannot: sustained turns/sec under load
and the state-store row count over time (boundedness: with within_s +
evict_after_s set, state must plateau and drain, not grow with history).

Run strictly serially (bench hygiene):

    python tools/cep_scale_probe.py --cores 16 \
        --source /tmp/arroyo_spark_scaling/input/turns

Prints one JSON line with turns/sec, per-epoch state rows, and the
max/final state sizes. Intended to be appended to BENCH/ evidence.
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
    p.add_argument("--cores", type=int, default=16)
    p.add_argument("--source", required=True)
    p.add_argument("--max-files-per-trigger", type=int, default=128)
    p.add_argument("--workdir", default="/tmp/arroyo_spark_cep_probe")
    p.add_argument("--within-s", type=float, default=3600.0)
    p.add_argument("--evict-after-s", type=float, default=3600.0)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from arroyo_spark.session import get_spark
    from arroyo_spark.streaming import ExactlyOnceSink, FileStreamSource, OffsetsLedger, StreamProcessor
    from arroyo_spark.streaming.cep import stateful_match_sequence
    from arroyo_spark.types import STREAM_SCHEMA

    spark = get_spark(
        f"cep_probe_{args.cores}",
        cores=args.cores,
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)

    n_turns = spark.read.schema(STREAM_SCHEMA).parquet(args.source).count()

    steps = [
        ("u", F.col("role") == "user"),
        ("a", F.col("role") == "assistant"),
        ("t", F.col("role") == "tool"),
    ]

    def pipeline(df):
        return stateful_match_sequence(
            df,
            "conv_id",
            steps,
            ts_col="ts",
            tiebreakers=("turn_idx",),
            within_s=args.within_s,
            watermark_delay="10 minutes",
            evict_after_s=args.evict_after_s,
        )

    ledger = OffsetsLedger(args.workdir, "cep")
    sink = ExactlyOnceSink(output_dir=f"{args.workdir}/cep", ledger=ledger)
    proc = StreamProcessor(
        spark=spark,
        source=FileStreamSource(args.source, STREAM_SCHEMA, args.max_files_per_trigger),
        sink=sink,
        checkpoint_dir=f"{args.workdir}/ckpt",
        pipeline=pipeline,
        output_mode="append",
        query_name="cep",
    )

    state_rows: list[dict] = []
    t0 = time.time()
    q = proc.start()
    seen = set()
    while q.isActive:
        q.awaitTermination(2)
        lp = q.lastProgress
        if lp and lp["batchId"] not in seen:
            seen.add(lp["batchId"])
            for so in lp.get("stateOperators", []):
                state_rows.append(
                    {
                        "batch": lp["batchId"],
                        "rows_total": so.get("numRowsTotal"),
                        "rows_updated": so.get("numRowsUpdated"),
                        "rows_removed": so.get("numRowsRemoved"),
                    }
                )
    elapsed = time.time() - t0

    matches = sink.read_output(spark).count()
    totals = [s["rows_total"] for s in state_rows if s["rows_total"] is not None]
    print(
        json.dumps(
            {
                "cores": args.cores,
                "turns": n_turns,
                "elapsed_s": round(elapsed, 2),
                "turns_per_sec": round(n_turns / elapsed, 1),
                "matches": matches,
                "epochs": len(ledger.epochs()),
                "state_rows_over_time": totals,
                "state_rows_max": max(totals) if totals else None,
                "state_rows_final": totals[-1] if totals else None,
                "within_s": args.within_s,
                "evict_after_s": args.evict_after_s,
            }
        )
    )


if __name__ == "__main__":
    main()
