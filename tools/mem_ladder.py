"""Memory-bandwidth ladder — the quietness probe that actually matters.

Round-4 finding: the pure-ALU cpu_ladder kernel is blind to the host
contention that throttles the streaming job. Evidence: a window with
record ALU numbers (4-proc 33.5M ops/s, 16-proc 115.6M — both session
maxima) produced the session's WORST job legs (36.6k t/s at local[4]).
The job is memory-bandwidth-bound (shuffle + state store + parquet decode
all stream bytes); co-tenants hammering the memory controller slow the
job while leaving register arithmetic untouched.

This ladder measures aggregate multi-process STREAM-like copy bandwidth
(numpy copyto over arrays far larger than LLC). Quiet window = aggregate
GB/s near the session maximum at BOTH process counts.

Usage: python tools/mem_ladder.py [--procs 4,16] [--mb 256] [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def kernel(mb: int, reps: int, barrier, q: mp.Queue) -> None:
    import numpy as np

    n = mb * 1024 * 1024 // 8
    src = np.ones(n, dtype=np.float64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # warm page tables
    barrier.wait()  # all procs stream together — true aggregate contention
    t0 = time.time()
    for _ in range(reps):
        np.copyto(dst, src)
    dt = time.time() - t0
    # bytes touched per rep: read src + write dst
    q.put(2 * mb * reps / 1024 / dt)  # GB/s for this process


def run_level(procs: int, mb: int, reps: int) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [mp.Process(target=kernel, args=(mb, reps, barrier, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    # sum of in-kernel rates: spawn/import excluded, overlap enforced by
    # the barrier (every proc streams while every other proc streams)
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="4,16")
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    out = {}
    for p in (int(x) for x in args.procs.split(",")):
        out[str(p)] = round(max(run_level(p, args.mb, args.reps) for _ in range(2)), 2)
    print(json.dumps({"aggregate_gbps": out}))


if __name__ == "__main__":
    main()
