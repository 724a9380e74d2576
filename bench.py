"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], plus the flagship transcript pipeline
(windowed agg + tool-call join) on a deterministic synthetic stream, and
reports per-query seconds and sustained turns/sec.

Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/bench_scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BENCH_CONVS", "60000"))  # ~0.5M turns w/ skew
RUNS = int(os.environ.get("BENCH_RUNS", "2"))  # best-of-N per query
# per-query codegen warmup corpus ("" disables); plan shape == bench plan
# shape, so the janino cache carries over while the data cost is pennies
WARMUP_SF_DIR = os.environ.get("BENCH_WARMUP_SF_DIR", "/root/testdata/sf0.001")

# -- self-certifying quietness gate (VERDICT r4 #1) --------------------------
# This VM shares a host: BENCH_r04 showed 4-10x phantom regressions on
# unchanged queries because the driver ran the bench in a contended window.
# The job is memory-bandwidth-bound, so the gate is tools/mem_ladder.py
# aggregate GB/s with ABSOLUTE floors (ratio gates mis-fire — see
# BENCH/BASELINE.md), probed BEFORE and AFTER the timed section (a pre-gate
# alone cannot certify the window; two r4 probes degraded mid-run). If the
# window fails, the whole bench re-runs (bounded attempts), and the emitted
# JSON always carries the probe readings + a quiet flag so the artifact is
# self-certifying either way.
GATE_FLOORS = {"2": 28.0, "8": 95.0}  # GB/s aggregate at 2 / 8 procs
GATE_ATTEMPTS = int(os.environ.get("BENCH_GATE_ATTEMPTS", "4"))
GATE_ENABLED = os.environ.get("BENCH_GATE", "1") != "0"
GATE_RETRY_SLEEP = float(os.environ.get("BENCH_GATE_SLEEP", "60"))


def gate_probe() -> dict[str, float]:
    from tools.mem_ladder import probe

    return probe(procs=tuple(int(k) for k in GATE_FLOORS))


def gate_ok(reading: dict[str, float] | None) -> bool:
    return reading is not None and all(
        reading.get(k, 0.0) >= v for k, v in GATE_FLOORS.items()
    )


def materialize(df) -> int:
    """Force FULL computation of every output column, return the row count.

    ``.count()`` is NOT a valid bench action: Catalyst prunes columns the
    action doesn't need, so a pure-projection query (doc_fingerprints,
    text_quality_langid, ...) would "run" as a row count over parquet and
    the md5/quality/lang-id expressions would never execute. Summing an
    xxhash64 over all columns makes every expression load-bearing while
    keeping the action a single driver-side row.
    """
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not sum: summing 64-bit hashes overflows long under ANSI
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
    ).collect()[0]
    return row["n"]


def warmup(spark) -> bool:
    """Absorb JVM/codegen/parquet-footer warmup before any timed query —
    otherwise the first query's number carries one-time cost and isn't
    comparable round-over-round. Returns whether the per-query codegen
    pass actually ran (the methodology string must not claim it otherwise).

    Two layers: two representative queries at the bench SF (JVM/JIT and
    parquet footers), then EVERY query once at the tiny warmup SF.
    Spark's whole-stage-codegen cache keys on the generated source, which
    for most of these plans is size-independent — the sf0.001 pass
    pre-compiles those janino classes for pennies. (Caveat: plans whose
    physical shape is size-dependent — e.g. a join that broadcasts at the
    warmup SF but sort-merges at the bench SF — compile different source
    and still pay their compile in run 1; best-of-RUNS absorbs that.)
    Without the pass, expression-heavy plans (the PQ family compiles ~10s
    of generated code) pay their compile inside the timed slot, and
    best-of-2 reads the compiler, not the engine."""
    from arroyo_spark import queries as q

    for name in ("reduce_tumbling", "tpch_q1_pricing"):
        materialize(q.QUERIES[name](spark, SF_DIR))
    if not (WARMUP_SF_DIR and os.path.isdir(WARMUP_SF_DIR)):
        print(f"WARN bench: no warmup corpus at {WARMUP_SF_DIR!r}; "
              "codegen pre-compile skipped", file=sys.stderr)
        return False
    for name, fn in q.QUERIES.items():
        try:
            materialize(fn(spark, WARMUP_SF_DIR))
        except Exception as e:  # a warmup miss must never fail the bench
            print(f"WARN bench: warmup {name}: {e}", file=sys.stderr)
    return True


def run_queries(spark) -> dict[str, float]:
    from arroyo_spark import queries as q

    timings: dict[str, float] = {}
    for name, fn in q.QUERIES.items():
        best = None
        for _ in range(max(RUNS, 1)):
            t0 = time.time()
            n = materialize(fn(spark, SF_DIR))  # all columns computed, see materialize()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if n == 0:
            print(f"WARN bench: {name} returned 0 rows", file=sys.stderr)
    return timings


def run_flagship_pipeline(spark) -> tuple[float, int]:
    """Windowed agg + tool-call correlation over synthetic transcripts."""
    from pyspark.sql import functions as F

    from arroyo_spark.operators import reduce_window
    from arroyo_spark.synth import tool_calls, transcripts

    t = transcripts(spark, N_CONVS, partitions=CPUS, with_lineage=False)
    t.cache()
    n_turns = t.count()  # materialize input once; time only the pipeline

    t0 = time.time()
    agg = reduce_window(
        t,
        "1 hour",
        aggs={
            "n_turns": F.count(F.lit(1)),
            "n_tools": F.countDistinct("tool"),
            "chars": F.sum(F.length("text")),
        },
        keys=["conv_id"],
    )
    calls = tool_calls(t)
    call_stats = calls.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias("n_errors"),
    )
    out = agg.join(call_stats, "conv_id", "left")
    # materialize(), not .count(): a left join preserves left-side row count,
    # so Catalyst would eliminate the join under a bare count
    materialize(out)
    elapsed = time.time() - t0
    t.unpersist()
    return elapsed, n_turns


def _timed_section(spark) -> tuple[dict[str, float], float, float, int]:
    t_start = time.time()
    timings = run_queries(spark)
    flagship_sec, n_turns = run_flagship_pipeline(spark)
    timings["flagship_pipeline"] = round(flagship_sec, 3)
    total = round(time.time() - t_start, 3)
    return timings, total, flagship_sec, n_turns


def main() -> None:
    from arroyo_spark.session import get_spark

    spark = get_spark(app_name="arroyo_spark_bench", cores=CPUS, shuffle_partitions=CPUS)
    codegen_warmed = warmup(spark)

    result = None
    for attempt in range(max(GATE_ATTEMPTS, 1)):
        last = attempt == max(GATE_ATTEMPTS, 1) - 1
        pre = gate_probe() if GATE_ENABLED else None
        if GATE_ENABLED and not gate_ok(pre) and not last:
            print(f"bench gate: contended pre-probe {pre}; retrying", file=sys.stderr)
            time.sleep(GATE_RETRY_SLEEP)
            continue
        timings, total, flagship_sec, n_turns = _timed_section(spark)
        post = gate_probe() if GATE_ENABLED else None
        quiet = gate_ok(pre) and gate_ok(post)
        result = (timings, total, flagship_sec, n_turns, pre, post, quiet)
        if quiet or not GATE_ENABLED:
            break
        if not last:
            print(
                f"bench gate: window failed post-probe (pre={pre} post={post}); re-running",
                file=sys.stderr,
            )
            time.sleep(GATE_RETRY_SLEEP)
    timings, total, flagship_sec, n_turns, pre, post, quiet = result

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "turns_per_sec": round(n_turns / flagship_sec, 1),
                "flagship_turns": n_turns,
                "cpus": CPUS,
                # self-certification: mem-bandwidth readings around the
                # timed section + the absolute floors they must clear.
                # quiet=false means every retry window was contended —
                # treat the timings as an upper bound, not a regression.
                "gate": {
                    "enabled": GATE_ENABLED,
                    "pre_gbps": pre,
                    "post_gbps": post,
                    "floors_gbps": GATE_FLOORS,
                    "quiet": bool(quiet) if GATE_ENABLED else None,
                },
                # methodology label (r3 lesson: an action change silently
                # invalidated cross-round comparisons). checksum-v1 = every
                # query materialized via agg(count, bit_xor(xxhash64(*cols)))
                # — all output columns load-bearing; best-of-RUNS per query
                # after a 2-query warmup at bench SF + one per-query pass at
                # the warmup SF (codegen pre-compile — the timed number reads
                # the engine, not janino). Comparable to BENCH_r03/r04/r05
                # (cold-compile noise removed, steady-state unchanged), NOT
                # to r01/r02 (those used .count(), which pruned projections).
                "methodology": "checksum-v1, best-of-%d, warmup%s"
                % (max(RUNS, 1), "+codegen" if codegen_warmed else ""),
            }
        )
    )


if __name__ == "__main__":
    main()
