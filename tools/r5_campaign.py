"""Round-5 serial measurement campaign (VERDICT r4 items #3 and #6).

Runs, strictly serially and each inside a memory-bandwidth-gated window
(the same pre+post probe bench.py now embeds):

  1. slope probe  — per-epoch fixed driver cost at 8 cores: the identical
     scaling worker at mft=128 vs mft=42 (the r4 protocol), fixed cost =
     d(elapsed)/d(epochs). Target: < 0.5 s/epoch.
     -> BENCH/epoch_fixed_cost_r5.json
  2. CEP scale probe — stateful_match_sequence over the full 33M-turn
     input at 16 cores: sustained turns/sec + state-store boundedness.
     -> BENCH/cep_scale_r5.json
  3. pair hunt — 2->8-core scaling pairs via tools/quiet_hunter.py
     (mem probe, absolute floors), until --max-pairs POST-certified
     pairs or --deadline-s elapses.
     -> BENCH/scaling_pool_r5.jsonl (raw, every run kept)

Gate floors match bench.py's GATE_FLOORS (28 GB/s aggregate at 2 procs,
95 at 8): measured quiet-window readings on this host are ~31-44 / ~100-113,
and every r4 phantom regression happened below them.
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

from tools.mem_ladder import run_level as mem_level  # noqa: E402

FLOORS = {2: 28.0, 8: 95.0}
SRC = "/tmp/arroyo_spark_scaling/input/turns"
CALLS = "/tmp/arroyo_spark_scaling/input/calls"


def gate() -> tuple[bool, dict[str, float]]:
    vals = {p: max(mem_level(p, 128, 8) for _ in range(2)) for p in (2, 8)}
    quiet = all(vals[p] >= FLOORS[p] for p in (2, 8))
    print(f"[gate] 2p={vals[2]:.1f} 8p={vals[8]:.1f} GB/s quiet={quiet}", flush=True)
    return quiet, {str(k): round(v, 2) for k, v in vals.items()}


def wait_quiet(max_tries: int = 10, sleep_s: int = 120) -> dict[str, float]:
    for _ in range(max_tries):
        ok, vals = gate()
        if ok:
            return vals
        time.sleep(sleep_s)
    print("[gate] never went quiet; proceeding with last reading (marked)", flush=True)
    return vals


def run_worker(cores: int, mft: int, workdir: str) -> dict:
    os.sync()
    time.sleep(10)
    out = subprocess.run(
        [sys.executable, f"{REPO}/tools/scaling_worker.py",
         "--cores", str(cores), "--source", SRC, "--calls", CALLS,
         "--workdir", workdir, "--max-files-per-trigger", str(mft)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def step_slope(max_attempts: int = 3) -> None:
    path = f"{REPO}/BENCH/epoch_fixed_cost_r5.json"
    for attempt in range(max_attempts):
        pre = wait_quiet()
        a = run_worker(8, 128, "/tmp/arroyo_spark_slope")
        b = run_worker(8, 42, "/tmp/arroyo_spark_slope2")
        ok_post, post = gate()
        slope = (b["elapsed_s"] - a["elapsed_s"]) / (b["epochs"] - a["epochs"])
        rec = {
            "fixed_cost_per_epoch_s": round(slope, 3),
            "epochs": [a["epochs"], b["epochs"]],
            "elapsed": [a["elapsed_s"], b["elapsed_s"]],
            "pre_gbps": pre, "post_gbps": post, "post_quiet": ok_post,
            "attempt": attempt,
        }
        with open(path, "w") as f:
            f.write(json.dumps(rec) + "\n" + json.dumps(a) + "\n" + json.dumps(b) + "\n")
        print(f"[slope] {slope:.3f} s/epoch post_quiet={ok_post}", flush=True)
        if ok_post and slope > 0:
            return
    print("[slope] exhausted attempts; last (possibly contended) kept", flush=True)


def step_cep(max_attempts: int = 2) -> None:
    path = f"{REPO}/BENCH/cep_scale_r5.json"
    for attempt in range(max_attempts):
        pre = wait_quiet()
        os.sync(); time.sleep(10)
        out = subprocess.run(
            [sys.executable, f"{REPO}/tools/cep_scale_probe.py",
             "--cores", "16", "--source", SRC],
            capture_output=True, text=True, check=True,
        )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        ok_post, post = gate()
        rec.update({"pre_gbps": pre, "post_gbps": post, "post_quiet": ok_post,
                    "attempt": attempt})
        with open(path, "w") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[cep] {rec['turns_per_sec']} turns/s state_max={rec['state_rows_max']} "
              f"final={rec['state_rows_final']} post_quiet={ok_post}", flush=True)
        if ok_post:
            return
    print("[cep] post-gate never passed; last run kept (marked)", flush=True)


def step_pairs(max_pairs: int, deadline: float) -> None:
    pool = f"{REPO}/BENCH/scaling_pool_r5.jsonl"
    certified = attempts = 0
    while certified < max_pairs and time.time() < deadline:
        rc = subprocess.run(
            [sys.executable, f"{REPO}/tools/quiet_hunter.py",
             "--pool", pool, "--probe", "mem", "--levels", "2,8",
             "--min-ratio", "2.0", "--min-abs-lo", "28", "--min-abs-hi", "95"],
        ).returncode
        attempts += 1
        if rc == 0:
            certified += 1
            print(f"[pairs] certified {certified}/{max_pairs}", flush=True)
        elif rc == 3:
            print("[pairs] window not quiet; retry in 90s", flush=True)
            time.sleep(90)
        elif rc == 4:
            print("[pairs] pair ran but post-gate failed (pooled, uncertified)", flush=True)
        else:
            print(f"[pairs] hunter rc={rc}; retry in 60s", flush=True)
            time.sleep(60)
    print(f"[pairs] done: {certified} certified in {attempts} attempts", flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--max-pairs", type=int, default=5)
    p.add_argument("--deadline-s", type=float, default=4.0 * 3600)
    p.add_argument("--skip-slope", action="store_true")
    p.add_argument("--skip-cep", action="store_true")
    args = p.parse_args()
    deadline = time.time() + args.deadline_s
    if not args.skip_slope:
        step_slope()
    if not args.skip_cep:
        step_cep()
    step_pairs(args.max_pairs, deadline)
    print("[campaign] complete", flush=True)


if __name__ == "__main__":
    main()
