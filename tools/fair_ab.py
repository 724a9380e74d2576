"""A/B: FIFO vs FAIR-pools scheduling for the two concurrent streaming
queries, 8-core leg only, one mem-gated window.

Motivation (BENCH/BASELINE.md r5 diagnosis): under FIFO the join query's
micro-batches wait while the agg query's stages hold all cores (join b1
triggerExecution 51.6 s vs addBatch 7.2 s). FAIR pools interleave the two
queries' tasks, overlapping the join's state-store I/O waits with the agg's
compute — a throughput term that should shrink the 8-core elapsed without
touching per-turn work.

Output: BENCH/fair_ab_r5.json with both legs + gate readings.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.mem_ladder import run_level as mem_level  # noqa: E402

FLOORS = {2: 28.0, 8: 95.0}
SRC = "/tmp/arroyo_spark_scaling/input/turns"
CALLS = "/tmp/arroyo_spark_scaling/input/calls"


def gate() -> tuple[bool, dict[str, float]]:
    vals = {p: max(mem_level(p, 128, 8) for _ in range(2)) for p in (2, 8)}
    return all(vals[p] >= FLOORS[p] for p in (2, 8)), {
        str(k): round(v, 2) for k, v in vals.items()
    }


def run(cores: int, fair: bool, workdir: str) -> dict:
    os.sync()
    time.sleep(10)
    env = dict(os.environ, SCALING_FAIR="1" if fair else "0")
    out = subprocess.run(
        [sys.executable, f"{REPO}/tools/scaling_worker.py",
         "--cores", str(cores), "--source", SRC, "--calls", CALLS,
         "--workdir", workdir],
        capture_output=True, text=True, check=True, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ok_pre, pre = gate()
    print(f"[gate pre] {pre} quiet={ok_pre}", flush=True)
    legs = []
    # interleave ABBA to cancel slow drift inside the window
    for fair in (False, True, True, False):
        r = run(8, fair, "/tmp/arroyo_spark_fair_ab")
        print(f"[leg] fair={fair} elapsed={r['elapsed_s']} tps={r['turns_per_sec']}",
              flush=True)
        legs.append(r)
    ok_post, post = gate()
    print(f"[gate post] {post} quiet={ok_post}", flush=True)
    fifo = [r for r in legs if not r["fair"]]
    fairs = [r for r in legs if r["fair"]]
    rec = {
        "protocol": "ABBA at 8 cores, one window, pre+post mem gate",
        "fifo_tps": [r["turns_per_sec"] for r in fifo],
        "fair_tps": [r["turns_per_sec"] for r in fairs],
        "fifo_best": max(r["turns_per_sec"] for r in fifo),
        "fair_best": max(r["turns_per_sec"] for r in fairs),
        "pre_gbps": pre, "post_gbps": post,
        "pre_quiet": ok_pre, "post_quiet": ok_post,
        "legs": legs,
    }
    with open(f"{REPO}/BENCH/fair_ab_r5.json", "w") as f:
        f.write(json.dumps(rec, indent=1) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("fifo_best", "fair_best", "pre_quiet", "post_quiet")}),
          flush=True)


if __name__ == "__main__":
    main()
