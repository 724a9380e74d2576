"""Quiet-window hunter: run a scaling pair only when the host is quiet.

This VM shares a host; the 4→16 silicon ladder varies 3.0x–3.9x by the
hour. A same-window scaling pair is only meaningful in a quiet window, so:
1. measure the no-Spark CPU ladder (cheap, ~2 min);
2. if the 4→16 ratio clears --min-ratio, run local[4] then local[16]
   back-to-back (same window) and append both results to a JSONL pool;
3. else exit 3 (caller retries later).

Pool entries are raw scaling_worker JSON + the window's ladder ratio; fold
them into the evidence file with tools/merge_scaling_evidence.py (wrap the
pool into an all_runs dict first — see BENCH/BASELINE.md appendix).

Usage: python tools/quiet_hunter.py --pool /tmp/pool.jsonl [--min-ratio 3.7]
       [--levels 4,16] [--skip-lo]  (--skip-lo: only the 16-core leg —
       useful when the 4-leg already has a quiet sample)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.cpu_ladder import run_level as alu_level  # noqa: E402
from tools.mem_ladder import run_level as mem_level  # noqa: E402


def worker(cores: int, workdir: str) -> dict:
    os.sync()
    time.sleep(10)
    out = subprocess.run(
        [
            sys.executable,
            f"{REPO}/tools/scaling_worker.py",
            "--cores", str(cores),
            "--source", "/tmp/arroyo_spark_scaling/input/turns",
            "--calls", "/tmp/arroyo_spark_scaling/input/calls",
            "--workdir", workdir,
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pool", required=True)
    p.add_argument("--min-ratio", type=float, default=3.7)
    p.add_argument("--min-abs-lo", type=float, default=0.0)
    p.add_argument("--min-abs-hi", type=float, default=0.0)
    p.add_argument("--levels", default="4,16")
    p.add_argument("--workdir", default="/tmp/arroyo_spark_scaling/hunt")
    p.add_argument("--skip-lo", action="store_true")
    p.add_argument(
        "--probe",
        choices=("alu", "mem"),
        default="alu",
        help="quietness instrument: 'alu' = pure-CPU ops ladder; 'mem' = "
        "aggregate STREAM-copy bandwidth (GB/s). The job is memory-"
        "bandwidth-bound, so 'mem' is the probe that actually predicts "
        "job throughput (an ALU-record window produced the worst job leg).",
    )
    args = p.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    if args.probe == "mem":
        lad = {p_: max(mem_level(p_, 128, 8) for _ in range(2)) for p_ in (lo, hi)}
        unit = "GB/s"
    else:
        lad = {p_: max(alu_level(p_, 12_000_000)[0] for _ in range(2)) for p_ in (lo, hi)}
        unit = "ops/s"
    ratio = lad[hi] / lad[lo]
    print(
        f"{args.probe}-ladder {lo}->{hi}: {ratio:.2f}x  (abs {lad[lo]:.4g} / {lad[hi]:.4g} {unit})",
        file=sys.stderr,
    )
    # gate on RATIO *and* ABSOLUTE per-level throughput: a contended
    # window can suppress the lo-proc ladder leg and fake a >=4x ratio
    # (observed: ratio 4.19 while the job ran its slowest-ever legs).
    # --min-abs-lo/hi default 0 (off) — calibrate from printed abs values.
    quiet = (
        ratio >= args.min_ratio
        and lad[lo] >= args.min_abs_lo
        and lad[hi] >= args.min_abs_hi
    )
    if not quiet:
        print(json.dumps({"quiet": False, "ladder_ratio": round(ratio, 2),
                          "ladder_abs": {str(lo): lad[lo], str(hi): lad[hi]}}))
        return 3

    results = []
    for level in ([hi] if args.skip_lo else [lo, hi]):
        r = worker(level, args.workdir)
        r["window_ladder_ratio"] = round(ratio, 2)
        r["window_ladder_probe"] = args.probe
        r["window_ladder_abs"] = {str(lo): round(lad[lo], 1), str(hi): round(lad[hi], 1)}
        r["t_wall"] = time.time()
        results.append(r)
        print(f"local[{level}]: {r['turns_per_sec']} turns/s", file=sys.stderr)

    # POST-gate (r4 lesson: a pre-probe cannot certify a 20-40-min window —
    # two r4 probes passed pre and degraded mid-run). Re-probe AFTER the
    # runs; a pair is fully certified only when BOTH probes clear the
    # floors. Entries always carry both readings — contended windows are
    # evidence too, just labeled.
    if args.probe == "mem":
        post = {p_: max(mem_level(p_, 128, 8) for _ in range(2)) for p_ in (lo, hi)}
    else:
        post = {p_: max(alu_level(p_, 12_000_000)[0] for _ in range(2)) for p_ in (lo, hi)}
    post_quiet = (
        post[hi] / post[lo] >= args.min_ratio
        and post[lo] >= args.min_abs_lo
        and post[hi] >= args.min_abs_hi
    )
    print(
        f"post-{args.probe}-ladder: abs {post[lo]:.4g} / {post[hi]:.4g} {unit} "
        f"(post_quiet={post_quiet})",
        file=sys.stderr,
    )
    for r in results:
        r["post_ladder_abs"] = {str(lo): round(post[lo], 1), str(hi): round(post[hi], 1)}
        r["post_quiet"] = post_quiet
        with open(args.pool, "a") as f:
            f.write(json.dumps(r) + "\n")
    print(
        json.dumps(
            {
                "quiet": True,
                "post_quiet": post_quiet,
                "ladder_ratio": round(ratio, 2),
                "runs": results,
            }
        )
    )
    return 0 if post_quiet else 4


if __name__ == "__main__":
    raise SystemExit(main())
