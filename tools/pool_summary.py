"""Summarize a scaling pool JSONL into per-pair efficiencies.

Pairs are consecutive (lo, hi) entries appended by tools/quiet_hunter.py
within one gated window. Prints one line per pair (efficiency = speedup /
core-ratio) plus the certified-subset and all-pairs medians, and emits a
machine-readable JSON tail for BENCH/BASELINE.md bookkeeping.

Usage: python tools/pool_summary.py [--pool BENCH/scaling_pool_r5.jsonl]
"""

from __future__ import annotations

import argparse
import json
import statistics


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pool", default="BENCH/scaling_pool_r5.jsonl")
    args = p.parse_args()

    runs = [json.loads(line) for line in open(args.pool)]
    pairs = []
    i = 0
    while i + 1 < len(runs):
        a, b = runs[i], runs[i + 1]
        if a["cores"] >= b["cores"]:  # malformed pairing; skip one entry
            i += 1
            continue
        ratio = b["cores"] / a["cores"]
        eff = (b["turns_per_sec"] / a["turns_per_sec"]) / ratio
        pairs.append(
            {
                "pair": len(pairs) + 1,
                "lo_tps": round(a["turns_per_sec"], 1),
                "hi_tps": round(b["turns_per_sec"], 1),
                "efficiency": round(eff, 3),
                "post_quiet": bool(a.get("post_quiet")),
                "pre_abs": a.get("window_ladder_abs"),
                "post_abs": a.get("post_ladder_abs"),
                "rows_equal": (a.get("agg_rows"), a.get("join_rows"))
                == (b.get("agg_rows"), b.get("join_rows")),
            }
        )
        i += 2

    for q in pairs:
        print(
            f"pair {q['pair']}: 2c={q['lo_tps']:.0f} 8c={q['hi_tps']:.0f} "
            f"eff={q['efficiency']:.3f} certified={q['post_quiet']} "
            f"exactly_once={q['rows_equal']} pre={q['pre_abs']} post={q['post_abs']}"
        )
    cert = [q["efficiency"] for q in pairs if q["post_quiet"]]
    allp = [q["efficiency"] for q in pairs]
    summary = {
        "n_pairs": len(pairs),
        "n_certified": len(cert),
        "median_all": round(statistics.median(allp), 3) if allp else None,
        "median_certified": round(statistics.median(cert), 3) if cert else None,
        "n_above_0.8_certified": sum(1 for e in cert if e >= 0.8),
        "n_above_0.8_all": sum(1 for e in allp if e >= 0.8),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
