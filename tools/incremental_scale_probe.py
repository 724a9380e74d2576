"""Incremental-dedup store compaction at scale (VERDICT r4 missing #1).

tests/test_compaction.py proves correctness at 50 toy epochs; this probe
measures the thing the compaction exists FOR: per-epoch wall time and
store-dirs-read as the number of committed epochs grows. Without
compaction each epoch anti-joins against a union of ALL prior epoch dirs
(O(committed epochs) listing/planning per epoch); with
``compact_every=K`` the read path is O(1 + tail).

Two strictly-serial runs over IDENTICAL deterministic input (pure-JVM
``spark.range`` synthesis — no data files needed):

  1. compacted   (compact_every=K, default 16)
  2. uncompacted (compact_every=None)  — capped at --uncompacted-epochs
     because its per-epoch cost is the very growth being demonstrated

Records per-epoch seconds + dirs-read series for both, a first-vs-last
quartile growth ratio, and keep-set equality between the two runs and
the batch ``exact_dedup`` oracle. Self-certifies the window with the
same memory-bandwidth probe bench.py embeds (pre AND post readings in
the JSON). Run with nothing else active (bench hygiene):

    python tools/incremental_scale_probe.py --epochs 192 --rows 20000

Prints one JSON line; intended destination BENCH/incremental_scale_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _epoch_df(spark, epoch: int, rows: int, pool: int):
    """Deterministic epoch batch: doc_id monotone with arrival, text drawn
    from a pool smaller than the corpus so duplicates recur across epochs
    (7 coprime to the pool -> full coverage)."""
    from pyspark.sql import functions as F

    lo = epoch * rows
    return spark.range(lo, lo + rows).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text number "), ((F.col("id") * 7) % pool).cast("string")).alias("text"),
    )


def _drive(spark, workdir: str, tag: str, epochs: int, rows: int, pool: int, compact_every):
    from arroyo_spark.streaming import OffsetsLedger
    from arroyo_spark.streaming.incremental import incremental_dedup_sink

    ledger = OffsetsLedger(workdir, tag)
    sink = incremental_dedup_sink(f"{workdir}/{tag}", ledger, compact_every=compact_every)
    times, dirs = [], []
    for i in range(epochs):
        dirs.append(len(sink.output_paths()) if i else 0)
        t0 = time.time()
        sink(_epoch_df(spark, i, rows, pool), epoch_id=i)
        times.append(round(time.time() - t0, 3))
    return sink, times, dirs


def _quartile_means(xs):
    q = max(1, len(xs) // 4)
    return round(sum(xs[:q]) / q, 3), round(sum(xs[-q:]) / q, 3)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--epochs", type=int, default=192)
    p.add_argument("--uncompacted-epochs", type=int, default=96)
    p.add_argument("--rows", type=int, default=20000)
    p.add_argument("--pool", type=int, default=200000)
    p.add_argument("--compact-every", type=int, default=16)
    p.add_argument("--workdir", default="/tmp/arroyo_spark_incr_probe")
    args = p.parse_args()

    from arroyo_spark.session import get_spark
    from tools.mem_ladder import probe as mem_probe

    pre = mem_probe()
    spark = get_spark(f"incr_probe_{args.cores}", cores=args.cores, shuffle_partitions=32)
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)

    # JVM/codegen warmup in a throwaway store so neither timed run absorbs it
    _drive(spark, args.workdir, "warm", 4, args.rows, args.pool, None)

    sc_, t_c, d_c = _drive(
        spark, args.workdir, "c", args.epochs, args.rows, args.pool, args.compact_every
    )
    su, t_u, d_u = _drive(
        spark, args.workdir, "u", args.uncompacted_epochs, args.rows, args.pool, None
    )

    # keep-set equality at the shared prefix: both runs saw identical input
    # for the first uncompacted-epochs epochs; compare against batch oracle
    from pyspark.sql import functions as F

    from arroyo_spark.operators.dedup import exact_dedup

    n_shared = args.uncompacted_epochs
    corpus = _epoch_df(spark, 0, n_shared * args.rows, args.pool)
    want = exact_dedup(corpus, "doc_id", "text").count()
    got_u = su.read_output(spark).count()
    got_c = (
        sc_.read_output(spark).where(F.col("doc_id") < n_shared * args.rows).count()
    )
    full_c = sc_.read_output(spark).count()
    want_full = exact_dedup(
        _epoch_df(spark, 0, args.epochs * args.rows, args.pool), "doc_id", "text"
    ).count()

    post = mem_probe()
    fc_first, fc_last = _quartile_means(t_c)
    fu_first, fu_last = _quartile_means(t_u)
    out = {
        "metric": "incremental_dedup_compaction_scale",
        "cores": args.cores,
        "rows_per_epoch": args.rows,
        "epochs": {"compacted": args.epochs, "uncompacted": args.uncompacted_epochs},
        "compact_every": args.compact_every,
        "epoch_s_first_vs_last_quartile": {
            "compacted": [fc_first, fc_last],
            "uncompacted": [fu_first, fu_last],
        },
        "growth_ratio_last_over_first": {
            "compacted": round(fc_last / fc_first, 2),
            "uncompacted": round(fu_last / fu_first, 2),
        },
        "dirs_read_final": {"compacted": d_c[-1], "uncompacted": d_u[-1]},
        "keepset": {
            "shared_prefix_want": want,
            "uncompacted_got": got_u,
            "compacted_got_prefix": got_c,
            "compacted_full": full_c,
            "compacted_full_want": want_full,
            "equal": got_u == got_c == want and full_c == want_full,
        },
        "epoch_s_compacted": t_c,
        "epoch_s_uncompacted": t_u,
        "dirs_read_compacted": d_c,
        "dirs_read_uncompacted": d_u,
        "gate": {"pre_gbps": pre, "post_gbps": post},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
