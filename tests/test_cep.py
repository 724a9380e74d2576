"""CEP operator semantics on hand-built frames (operators/cep.py).

Oracle parity for the two driver queries is covered by test_oracle_parity;
these tests pin the *semantics*: greedy earliest completion, the strictness
of "after", the within-anchor cutoff, and adjacency (no skipped rows).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from arroyo_spark.operators import match_adjacent, match_sequence


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, i int, ev string")


def test_match_sequence_greedy_earliest(spark):
    rows = [
        # k=a completes: A@1, B@3 (earliest after A), C@4
        ("a", _ts(1), 0, "A"),
        ("a", _ts(2), 1, "C"),  # C before any B — must NOT anchor the match
        ("a", _ts(3), 2, "B"),
        ("a", _ts(4), 3, "C"),
        ("a", _ts(5), 4, "B"),  # later B ignored (greedy earliest)
        # k=b never completes: B precedes A, no B after A
        ("b", _ts(1), 0, "B"),
        ("b", _ts(2), 1, "A"),
        ("b", _ts(3), 2, "C"),  # C after A but no B in between chain
    ]
    out = match_sequence(
        _frame(spark, rows),
        key="k",
        steps=[("a", F.col("ev") == "A"), ("b", F.col("ev") == "B"), ("c", F.col("ev") == "C")],
        tiebreakers=["i"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["k"] == "a"
    assert (r["a_ts"], r["b_ts"], r["c_ts"]) == (_ts(1), _ts(3), _ts(4))


def test_match_sequence_strictly_after_on_ties(spark):
    # B at the SAME timestamp as A but a later tiebreaker is "after";
    # B at the same timestamp and an earlier tiebreaker is not.
    rows = [
        ("a", _ts(1), 1, "A"),
        ("a", _ts(1), 2, "B"),  # after A in (ts, i) order -> completes
        ("b", _ts(1), 2, "A"),
        ("b", _ts(1), 1, "B"),  # before A in (ts, i) order -> no match
    ]
    out = match_sequence(
        _frame(spark, rows),
        key="k",
        steps=[("a", F.col("ev") == "A"), ("b", F.col("ev") == "B")],
        tiebreakers=["i"],
    ).collect()
    assert [r["k"] for r in out] == ["a"]


def test_match_sequence_within_anchor_cutoff(spark):
    rows = [
        ("a", _ts(0), 0, "A"),
        ("a", _ts(5), 1, "B"),   # within 10 min of anchor
        ("a", _ts(20), 2, "C"),  # outside -> pattern must NOT complete
        ("b", _ts(0), 0, "A"),
        ("b", _ts(5), 1, "B"),
        ("b", _ts(9), 2, "C"),   # inside -> completes
    ]
    out = match_sequence(
        _frame(spark, rows),
        key="k",
        steps=[("a", F.col("ev") == "A"), ("b", F.col("ev") == "B"), ("c", F.col("ev") == "C")],
        tiebreakers=["i"],
        within="10 minutes",
    ).collect()
    assert [r["k"] for r in out] == ["b"]


def test_match_adjacent_no_skips_and_overlap(spark):
    rows = [
        ("a", _ts(1), 0, "A"),
        ("a", _ts(2), 1, "B"),  # A,B adjacent -> hit anchored @1
        ("a", _ts(3), 2, "A"),
        ("a", _ts(4), 3, "X"),  # A,X -> no hit (strict contiguity)
        ("a", _ts(5), 4, "A"),
        ("a", _ts(6), 5, "B"),  # second hit @5
        ("b", _ts(1), 0, "A"),
        ("b", _ts(3), 1, "B"),  # adjacent ROWS (gap in time is fine)
    ]
    out = match_adjacent(
        _frame(spark, rows),
        key="k",
        steps=[("first", F.col("ev") == "A"), ("second", F.col("ev") == "B")],
        tiebreakers=["i"],
    )
    got = sorted((r["k"], r["first_ts"], r["second_ts"]) for r in out.collect())
    assert got == [
        ("a", _ts(1), _ts(2)),
        ("a", _ts(5), _ts(6)),
        ("b", _ts(1), _ts(3)),
    ]


def test_match_absence_timeout_detection(spark):
    from arroyo_spark.operators import match_absence

    rows = [
        ("a", _ts(1), 0, "T"),   # resolved @3 (within 5 min)
        ("a", _ts(3), 1, "R"),
        ("a", _ts(10), 2, "T"),  # next R is @20 — too late -> unresolved
        ("a", _ts(20), 3, "R"),
        ("b", _ts(1), 0, "T"),   # no R ever -> unresolved, null R ts
        ("b", _ts(2), 1, "X"),
    ]
    out = match_absence(
        _frame(spark, rows),
        key="k",
        first=("t", F.col("ev") == "T"),
        second=("r", F.col("ev") == "R"),
        within="5 minutes",
        tiebreakers=["i"],
    )
    got = sorted((r["k"], r["t_ts"], r["r_ts"]) for r in out.collect())
    assert got == [("a", _ts(10), _ts(20)), ("b", _ts(1), None)]


def test_match_sequence_single_shuffle_plan(spark):
    """The K-step chain must cost ONE exchange: every window pass reuses the
    same (key) partitioning + (ts, tiebreakers) sort."""
    rows = [("a", _ts(1), 0, "A"), ("a", _ts(2), 1, "B"), ("a", _ts(3), 2, "C")]
    df = match_sequence(
        _frame(spark, rows),
        key="k",
        steps=[("a", F.col("ev") == "A"), ("b", F.col("ev") == "B"), ("c", F.col("ev") == "C")],
        tiebreakers=["i"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window chain + (at most) one for the final
    # groupBy partial/final agg — never one per step
    assert plan.count("Exchange hashpartitioning") <= 2


def test_match_runs_maximal_islands(spark):
    from arroyo_spark.operators import match_runs

    rows = [
        # k=a: runs of A at [1,2,3], break at 4, run [5,6], trailing B
        ("a", _ts(1), 0, "A"),
        ("a", _ts(2), 1, "A"),
        ("a", _ts(3), 2, "A"),
        ("a", _ts(4), 3, "B"),
        ("a", _ts(5), 4, "A"),
        ("a", _ts(6), 5, "A"),
        ("a", _ts(7), 6, "B"),
        # k=b: single-row run (filtered by min_len=2)
        ("b", _ts(1), 0, "A"),
        ("b", _ts(2), 1, "B"),
    ]
    out = match_runs(
        _frame(spark, rows),
        key="k",
        cond=F.col("ev") == "A",
        tiebreakers=["i"],
        min_len=2,
    ).collect()
    got = sorted((r["k"], r["run_start_ts"], r["run_end_ts"], r["run_len"]) for r in out)
    assert got == [
        ("a", _ts(1), _ts(3), 3),
        ("a", _ts(5), _ts(6), 2),
    ]


def test_match_runs_min_len_1_reports_every_island(spark):
    from arroyo_spark.operators import match_runs

    rows = [
        ("a", _ts(1), 0, "A"),
        ("a", _ts(2), 1, "B"),
        ("a", _ts(3), 2, "A"),
    ]
    out = match_runs(
        _frame(spark, rows), key="k", cond=F.col("ev") == "A", tiebreakers=["i"]
    ).collect()
    got = sorted((r["run_start_ts"], r["run_len"]) for r in out)
    assert got == [(_ts(1), 1), (_ts(3), 1)]


def test_match_runs_single_shuffle_plan(spark):
    """Gaps-and-islands groupBy((key, _run)) must REUSE the window's
    hash-by-key exchange (subset-satisfies-clustering): one exchange total."""
    from arroyo_spark.operators import match_runs

    rows = [("a", _ts(1), 0, "A"), ("a", _ts(2), 1, "A")]
    df = match_runs(_frame(spark, rows), key="k", cond=F.col("ev") == "A", tiebreakers=["i"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_duplicate_step_names_rejected(spark):
    rows = [("a", _ts(1), 0, "A")]
    df = _frame(spark, rows)
    import pytest as _pytest

    for fn in (match_sequence, match_adjacent):
        with _pytest.raises(ValueError, match="unique"):
            fn(df, key="k", steps=[("x", F.col("ev") == "A"), ("x", F.col("ev") == "B")])


def test_match_sequence_partition_by_single_exchange(spark):
    """With partition_by, the final groupBy must include the partition
    columns so it reuses the window's exchange — one exchange total."""
    rows = [
        ("a", _ts(1), 0, "A"),
        ("a", _ts(2), 1, "B"),
    ]
    df = spark.createDataFrame(
        [(k, k + "_raw", ts, i, ev) for k, ts, i, ev in rows],
        "k string, raw string, ts timestamp, i int, ev string",
    )
    out = match_sequence(
        df,
        key="k",
        steps=[("a", F.col("ev") == "A"), ("b", F.col("ev") == "B")],
        tiebreakers=["i"],
        partition_by=["raw"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    r = out.collect()
    assert [(x["k"], x["a_ts"], x["b_ts"]) for x in r] == [("a", _ts(1), _ts(2))]
    assert out.columns == ["k", "a_ts", "b_ts"]
