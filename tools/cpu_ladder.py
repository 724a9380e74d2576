"""No-Spark CPU ladder — measure the host's parallel-silicon ceiling.

This VM's 32 vCPUs sit on a SHARED physical host: how much real silicon a
16-way job gets depends on other tenants (hypervisor steal). The scaling
evidence (tools/bench_scaling.py) divides job speedup by the IDEAL factor
(4x); this tool measures what the host actually offers TODAY, so a
job-efficiency number can be read against the same-day hardware ceiling
rather than an ideal the host itself cannot reach.

Method: P worker processes each run an identical fixed CPU-bound kernel
(pure-python hashing loop, no memory pressure, no I/O); aggregate
throughput(P) / (P * throughput(1)) is the silicon efficiency at P.

Usage: python tools/cpu_ladder.py [--procs 1,4,16,32] [--iters 6000000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def kernel(iters: int, out) -> None:
    h = 0
    t0 = time.time()
    for i in range(iters):
        h = (h * 1103515245 + i) & 0xFFFFFFFFFFFF
    out.put((iters / (time.time() - t0), h))


def run_level(procs: int, iters: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=kernel, args=(iters, q)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    rates = [q.get()[0] for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    return procs * iters / wall, sum(rates)  # aggregate ops/s (wall-based)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,4,16,32")
    ap.add_argument("--iters", type=int, default=6_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    levels = [int(x) for x in args.procs.split(",")]
    best: dict[int, float] = {}
    for p in levels:
        for _ in range(args.repeats):
            agg, _ = run_level(p, args.iters)
            best[p] = max(best.get(p, 0.0), agg)
    base = best[levels[0]] / levels[0]
    out = {
        "levels": {
            str(p): {
                "agg_ops_per_s": round(best[p], 0),
                "speedup_vs_1proc": round(best[p] / base, 2),
                "silicon_efficiency": round(best[p] / (p * base), 3),
            }
            for p in levels
        }
    }
    if 4 in best and 16 in best:
        out["ladder_4_to_16"] = round(best[16] / best[4], 2)
        out["ceiling_4_to_16"] = round(best[16] / best[4] / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
