"""CEP sequence-pattern detection over keyed, time-ordered event streams.

The north rule asks for a structured-streaming / CEP engine; windows,
watermarks, and stateful joins are covered elsewhere (operators/reduce.py,
operators/join.py) — this module adds the remaining CEP primitive: sequence
*pattern* detection (SQL MATCH_RECOGNIZE's core), re-expressed as a
single-shuffle chain of window functions. No per-row Python, no iteration,
no self-joins.

Two contiguity modes, mirroring MATCH_RECOGNIZE:

- ``match_sequence`` — "followed by" (skip-till-next-match): step k matches
  the earliest row satisfying its condition strictly AFTER a step-(k-1)
  match, itself chained back to the key's earliest step-0 row. Greedy
  earliest-completion: one row per key that completes the whole pattern,
  with each step's matched event time. Optional ``within`` bounds the whole
  match to a time interval anchored at the step-0 event.
- ``match_adjacent`` — strict contiguity (no rows skipped): positions
  p..p+K-1 in the key's sort order match conditions 0..K-1; every anchor
  row is returned.

Plan shape (audited in PLANS.md): ONE Exchange (hash by key) + ONE Sort;
the K chained Window nodes all reuse that sort order, so each extra pattern
step costs a window-function pass over already-sorted partitions — never
another shuffle. At 10^12 turns this is the same per-conversation shuffle
the session windows already pay, and the running-min state per window
function is O(1) per row. The reference (getsentry/arroyo) has no CEP
operator; this is a first-class addition per the task brief, with
DuckDB-oracle parity via identical window-frame SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Step = tuple[str, Column]


def _order_cols(ts_col: str, tiebreakers: Sequence[str]) -> list[Column]:
    return [F.col(ts_col)] + [F.col(c) for c in tiebreakers]


def _check_unique_names(steps: Sequence[Step]) -> None:
    names = [n for n, _ in steps]
    if len(set(names)) != len(names):
        raise ValueError(
            f"step names must be unique (flag/output columns are keyed by "
            f"name): {names}"
        )


def _partition(key: str, partition_by: Sequence[str] | None) -> list[str]:
    """Window partition columns: ``partition_by`` may name a column set
    that is partition-EQUIVALENT to ``key`` (e.g. the raw id a derived key
    is a 1:1 function of) so the window reuses an upstream exchange on
    those columns instead of re-shuffling by the derived key."""
    return list(partition_by) if partition_by else [key]


def match_sequence(
    df: DataFrame,
    key: str,
    steps: Sequence[Step],
    ts_col: str = "ts",
    tiebreakers: Sequence[str] = (),
    within: str | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Earliest sequential completion of ``steps`` per ``key``.

    steps: ordered ``(name, condition)`` pairs; names become output columns
    ``<name>_ts`` (the matched event's ``ts_col``). A key appears in the
    output iff the full pattern completes; the reported chain is the greedy
    earliest one (earliest step-0 row, then the earliest step-1 row after
    it, ...). ``within`` (e.g. ``"30 days"``) additionally requires every
    step-k>0 match to lie within that interval of the step-0 anchor.

    Ties in ``ts_col`` are broken by ``tiebreakers`` (row-frame strictness:
    "after" means strictly later in the (ts, *tiebreakers) order, even at
    equal timestamps).
    """
    if len(steps) < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    _check_unique_names(steps)
    seen = (
        Window.partitionBy(*_partition(key, partition_by))
        .orderBy(*_order_cols(ts_col, tiebreakers))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    first = steps[0][0]
    out = df
    for i, (name, cond) in enumerate(steps):
        if i == 0:
            m = cond
        else:
            prev = F.min(F.when(F.col(f"_m_{steps[i - 1][0]}"), F.col(ts_col))).over(seen)
            m = cond & prev.isNotNull()
            if within is not None:
                anchor = F.min(F.when(F.col(f"_m_{first}"), F.col(ts_col))).over(seen)
                m = m & (F.col(ts_col) <= anchor + F.expr(f"INTERVAL {within}"))
        out = out.withColumn(f"_m_{name}", m)
    aggs = [
        F.min(F.when(F.col(f"_m_{name}"), F.col(ts_col))).alias(f"{name}_ts")
        for name, _ in steps
    ]
    # group by the partition columns too (superset): hash on the window's
    # partition keys already satisfies this clustering, so the agg reuses
    # the window's exchange instead of re-shuffling by the derived key
    group_cols = list(dict.fromkeys([*_partition(key, partition_by), key]))
    res = out.groupBy(*group_cols).agg(*aggs)
    # last step matching implies the whole chain matched (its condition
    # required a prior step-(K-1) match, recursively).
    return res.filter(F.col(f"{steps[-1][0]}_ts").isNotNull()).select(
        key, *[f"{name}_ts" for name, _ in steps]
    )


def match_absence(
    df: DataFrame,
    key: str,
    first: Step,
    second: Step,
    within: str,
    ts_col: str = "ts",
    tiebreakers: Sequence[str] = (),
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Absence / timeout detection: every ``first``-matching row with NO
    ``second``-matching row in the ``within`` interval strictly after it
    (the CEP "A not followed by B" pattern — e.g. a tool call with no
    assistant response within 5 minutes).

    Output: one row per unresolved ``first`` match — ``key``,
    ``<first>_ts``, and ``<second>_ts`` (the eventual too-late match, or
    null if none ever came). Same single-shuffle shape as
    ``match_sequence``: one window pass over the key's (ts, *tiebreakers)
    sort computes the next-``second`` time for every row.
    """
    fname, fcond = first
    sname, scond = second
    nxt = (
        Window.partitionBy(*_partition(key, partition_by))
        .orderBy(*_order_cols(ts_col, tiebreakers))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    out = df.withColumn(
        f"{sname}_ts", F.min(F.when(scond, F.col(ts_col))).over(nxt)
    ).withColumn("_first", fcond)
    deadline = F.col(ts_col) + F.expr(f"INTERVAL {within}")
    return (
        out.filter(
            F.col("_first")
            & (F.col(f"{sname}_ts").isNull() | (F.col(f"{sname}_ts") > deadline))
        )
        .select(key, F.col(ts_col).alias(f"{fname}_ts"), f"{sname}_ts")
    )


def match_runs(
    df: DataFrame,
    key: str,
    cond: Column,
    ts_col: str = "ts",
    tiebreakers: Sequence[str] = (),
    min_len: int = 1,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Kleene-plus quantifier (MATCH_RECOGNIZE ``A+`` / Flink CEP
    ``oneOrMore().consecutive()``): every MAXIMAL run of consecutive
    ``cond``-matching rows per ``key``, in the key's (ts, *tiebreakers)
    order, with ``run_len >= min_len``.

    Gaps-and-islands in one window pass: the island id is the running
    count of NON-matching rows (constant within a run, bumps at every
    break), then one groupBy((key, island)) aggregates each run's extent.
    Output: ``key``, ``run_start_ts``, ``run_end_ts``, ``run_len``.

    Scale shape: the same single hash-by-key Exchange + Sort every other
    CEP operator pays; the island id is O(1) running state, and the final
    aggregation groups by (key, _run) — a SUPERSET of the window's
    partition keys, so Catalyst reuses the existing exchange (hash on a
    subset satisfies clustering on the superset): no second shuffle.
    ``partition_by`` (partition-EQUIVALENT columns, see ``_partition``)
    is honored in both the window and the groupBy for upstream exchange
    reuse."""
    part = _partition(key, partition_by)
    w = (
        Window.partitionBy(*part)
        .orderBy(*_order_cols(ts_col, tiebreakers))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    island = F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))).over(w)
    group_cols = list(dict.fromkeys([*part, key, "_run"]))
    res = (
        df.withColumn("_hit", cond)
        .withColumn("_run", island)
        .filter("_hit")
        .groupBy(*group_cols)
        .agg(
            F.min(ts_col).alias("run_start_ts"),
            F.max(ts_col).alias("run_end_ts"),
            F.count(F.lit(1)).alias("run_len"),
        )
    )
    if min_len > 1:
        res = res.filter(F.col("run_len") >= min_len)
    return res.select(key, "run_start_ts", "run_end_ts", "run_len")


def match_adjacent(
    df: DataFrame,
    key: str,
    steps: Sequence[Step],
    ts_col: str = "ts",
    tiebreakers: Sequence[str] = (),
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Strict-contiguity pattern: K consecutive rows (no skips) in the
    key's (ts, *tiebreakers) order matching conditions 0..K-1.

    Returns every anchor row (the step-0 row of each occurrence) with the
    anchor's ``ts_col`` plus each later step's ``<name>_ts`` via lead().
    Occurrences may overlap (every anchor reported — MATCH_RECOGNIZE
    "all rows per match" flavor rather than skip-past-last-row).
    """
    if len(steps) < 2:
        raise ValueError("match_adjacent needs at least 2 steps")
    _check_unique_names(steps)
    w = Window.partitionBy(*_partition(key, partition_by)).orderBy(
        *_order_cols(ts_col, tiebreakers)
    )
    out = df
    for name, cond in steps:
        out = out.withColumn(f"_f_{name}", cond)
    # every window expression must be materialized BEFORE the filter —
    # a lead() projected after filtering would see post-filter neighbors
    pred = F.col(f"_f_{steps[0][0]}")
    out = out.withColumn(f"{steps[0][0]}_ts", F.col(ts_col))
    for i, (name, _) in enumerate(steps[1:], start=1):
        pred = pred & F.lead(F.col(f"_f_{name}"), i).over(w)
        out = out.withColumn(f"{name}_ts", F.lead(F.col(ts_col), i).over(w))
    return (
        out.withColumn("_hit", pred)
        .filter("_hit")
        .select(key, *[f"{name}_ts" for name, _ in steps])
    )
