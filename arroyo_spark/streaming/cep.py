"""Streaming CEP: stateful sequence-pattern detection across micro-batches.

The batch operator (operators/cep.py::match_sequence) computes the greedy
earliest chain with window functions; this is its streaming counterpart for
an unbounded keyed stream: per-key state carries the earliest chain times
found so far, each epoch advances it, and a key is emitted exactly once —
in the epoch where its pattern completes. State survives restart via the
checkpointed state store (same guarantee the reference gets from offset
replay, /root/reference/arroyo/processing/strategies/reduce.py:15-66 —
except here the partial chain itself is durable, so completion does not
re-read history).

Contract: per-key rows must arrive in non-decreasing (ts, *tiebreakers)
order across epochs (epoch boundaries are time-ordered in this engine's
PipeTopic replay; within an epoch any order is fine — rows are sorted
before folding). Under that contract the emitted (key, step times) set is
provably equal to the batch operator over the concatenated input: the
greedy chain is an online fold — step 0 keeps the minimum matching ts,
step k>0 sets once when its condition meets a row strictly after a
completed step k-1, anchored within ``within`` of the step-0 time.

Python-side work is O(rows) boolean/min bookkeeping over K small floats:
the step *conditions* are evaluated JVM-side (Column expressions become
``_f_k`` flag columns before the stateful fold), so no text/payload bytes
cross into Python.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

Step = tuple[str, Column]


def _key_field(df: DataFrame, key: str) -> T.StructField:
    """Output key field with the SOURCE column's type — a bigint key must
    not be silently declared string (Arrow would reject the first emission
    at runtime)."""
    return T.StructField(key, df.schema[key].dataType)


def stateful_match_sequence(
    df: DataFrame,
    key: str,
    steps: Sequence[Step],
    ts_col: str = "ts",
    tiebreakers: Sequence[str] = (),
    within_s: float | None = None,
    watermark_delay: str | None = None,
    evict_after_s: float | None = None,
) -> DataFrame:
    """Emit ``(key, <name>_ts...)`` once per key, in the micro-batch where
    the full pattern first completes. Output timestamps are the greedy
    earliest chain — identical to batch ``match_sequence`` under the
    in-order-per-key contract (module docstring).

    State bound (the 10^12-turn concern: without eviction, state is O(keys)
    forever). With ``watermark_delay`` set (e.g. ``"10 minutes"``), state is
    evicted on event-time timeouts:

    - **dead chains** (``within_s`` set, anchored, incomplete): evicted once
      the watermark passes ``anchor + within_s``. The evicted chain itself
      provably can never complete (later rows cannot satisfy the within
      check). Caveat: after eviction the key looks never-anchored again, so
      a LATER step-0 row re-anchors it and can emit a match batch would
      not (batch anchors at the global earliest step-0 row, which the
      evicted chain held). Same trade as Flink CEP's state TTL: exact
      suppression requires the dead anchor kept forever; eviction bounds
      state and re-admits keys whose activity resumes past the horizon.
    - **never-anchored keys**: no state is written at all (re-created if a
      step-0 match arrives later). Exact.
    - **completed keys** (``evict_after_s`` set): the completion tombstone —
      kept only to suppress a second emission — is evicted once the
      watermark passes ``completion + evict_after_s``. This is the one
      knob that trades exactness for bounded state (Flink CEP state-TTL
      semantics): if a key matches AGAIN entirely after the horizon it
      re-emits, where the batch operator (anchored at the global earliest
      step-0 row) would not. Leave it ``None`` to keep tombstones forever.
    """
    if len(steps) < 2:
        raise ValueError("stateful_match_sequence needs at least 2 steps")
    if evict_after_s is not None and watermark_delay is None:
        raise ValueError("evict_after_s requires watermark_delay")
    if watermark_delay is not None and within_s is None and evict_after_s is None:
        # watermark_delay alone bounds NOTHING: dead-chain eviction needs a
        # within_s horizon and tombstone eviction needs evict_after_s —
        # with neither, anchored-incomplete state still grows O(keys)
        # forever and the knob would silently read as "bounded" (ADVICE r4)
        import warnings

        warnings.warn(
            "watermark_delay without within_s/evict_after_s registers no "
            "event-time timeouts — anchored-incomplete state remains "
            "unbounded; set within_s (dead-chain eviction) and/or "
            "evict_after_s (tombstone eviction) to bound state",
            stacklevel=2,
        )
    k_steps = len(steps)
    names = [n for n, _ in steps]
    use_timeouts = watermark_delay is not None

    src = df.withWatermark(ts_col, watermark_delay) if use_timeouts else df
    flagged = src.select(
        F.col(key).alias("_k"),
        # the watermark column itself must survive the projection untouched
        # for EventTimeTimeout; _ts is its double twin for the Python fold
        *([F.col(ts_col)] if use_timeouts else []),
        F.col(ts_col).cast("double").alias("_ts"),
        *[F.col(c).cast("double").alias(f"_tb{i}") for i, c in enumerate(tiebreakers)],
        *[cond.cast("boolean").alias(f"_f{i}") for i, (_, cond) in enumerate(steps)],
    )
    sort_cols = ["_ts"] + [f"_tb{i}" for i in range(len(tiebreakers))]

    state_schema = T.StructType(
        [T.StructField(f"t{i}", T.DoubleType()) for i in range(k_steps)]
        + [T.StructField("emitted", T.BooleanType())]
    )
    out_schema = T.StructType(
        [_key_field(df, key)]
        + [T.StructField(f"{n}_ts", T.DoubleType()) for n in names]
    )

    def _set_timeout(state: GroupState, at_s: float) -> None:
        # event-time timeouts must be strictly later than the watermark
        at_ms = max(int(at_s * 1000), state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(at_ms)

    def handle(
        kt: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # dead chain (can never complete) or expired completion
            # tombstone — see docstring for exactness of each case
            state.remove()
            return
        if state.exists:
            *chain, emitted = state.get
            chain = [None if (c is None or math.isnan(c)) else c for c in chain]
        else:
            chain, emitted = [None] * k_steps, False
        if emitted:  # pattern already reported for this key — drain input
            for _ in pdfs:
                pass
            # invoking the function resets any registered timeout — the
            # tombstone's eviction must be re-registered or it never fires
            if use_timeouts and evict_after_s is not None:
                _set_timeout(state, chain[-1] + evict_after_s)
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(sort_cols)
        flags = [batch[f"_f{i}"].to_numpy() for i in range(k_steps)]
        tss = batch["_ts"].to_numpy()
        for r in range(len(batch)):
            ts = float(tss[r])
            # compute against the PRE-row chain, apply after: a row never
            # chains onto its own match ("strictly after", as in batch)
            upd: dict[int, float] = {}
            if flags[0][r] and (chain[0] is None or ts < chain[0]):
                upd[0] = ts
            for i in range(1, k_steps):
                if (
                    chain[i] is None
                    and flags[i][r]
                    and chain[i - 1] is not None
                    and (within_s is None or ts <= chain[0] + within_s)
                ):
                    upd[i] = ts
            for i, v in upd.items():
                chain[i] = v
            if chain[-1] is not None:
                break
        done = chain[-1] is not None
        if not done and chain[0] is None:
            # never-anchored: write no state (re-created if an anchor
            # arrives later — exact, and O(matched keys) instead of O(keys))
            if state.exists:
                state.remove()
            return
        state.update(tuple([*chain, done]))
        if use_timeouts:
            if done and evict_after_s is not None:
                _set_timeout(state, chain[-1] + evict_after_s)
            elif not done and within_s is not None:
                _set_timeout(state, chain[0] + within_s)
        if done:
            yield pd.DataFrame([{key: kt[0], **{f"{n}_ts": chain[i] for i, n in enumerate(names)}}])

    timeout = (
        GroupStateTimeout.EventTimeTimeout if use_timeouts else GroupStateTimeout.NoTimeout
    )
    return flagged.groupBy("_k").applyInPandasWithState(
        handle, out_schema, state_schema, "append", timeout
    )


def stateful_match_absence(
    df: DataFrame,
    key: str,
    first: Step,
    second: Step,
    within_s: float,
    watermark_delay: str,
    ts_col: str = "ts",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Streaming timeout detector: emit ``(key, <first>_ts, <second>_ts)``
    for every ``first`` match with no ``second`` match within ``within_s``
    strictly after it.

    Two emission paths, one per failure shape:

    - a too-late ``second`` arrives BEFORE the deadline timer fires ->
      emitted in that micro-batch, with its time in ``<second>_ts`` (the
      row batch produces);
    - the deadline timer fires first (watermark passes
      ``first + within_s``) -> emitted then with ``<second>_ts`` null.
      This is the alert-at-deadline behavior a monitoring pipeline
      actually wants — an alert cannot wait for a B that may never come.

    The emitted (key, first_ts) SET always equals the batch operator's;
    the ``<second>_ts`` VALUE is null on the timer path even if a
    too-late ``second`` arrives afterwards (the pending entry is already
    emitted and dropped — batch, seeing the whole history, reports the
    late time instead). Which path wins depends on timer/data
    interleaving; only the null-vs-late-time column differs.

    State is the pending-``first`` list per key, evicted as resolved /
    emitted — bounded by ``within_s`` x arrival rate, not by history.
    Same in-order-per-key contract as ``stateful_match_sequence``.
    """
    fname, fcond = first
    sname, scond = second
    flagged = df.withWatermark(ts_col, watermark_delay).select(
        F.col(key).alias("_k"),
        F.col(ts_col),
        F.col(ts_col).cast("double").alias("_ts"),
        *[F.col(c).cast("double").alias(f"_tb{i}") for i, c in enumerate(tiebreakers)],
        fcond.cast("boolean").alias("_fa"),
        scond.cast("boolean").alias("_fb"),
    )
    sort_cols = ["_ts"] + [f"_tb{i}" for i in range(len(tiebreakers))]
    state_schema = T.StructType([T.StructField("pending", T.ArrayType(T.DoubleType()))])
    out_schema = T.StructType(
        [
            _key_field(df, key),
            T.StructField(f"{fname}_ts", T.DoubleType()),
            T.StructField(f"{sname}_ts", T.DoubleType()),
        ]
    )

    def _emit(rows: list[tuple[str, float, float | None]]) -> pd.DataFrame:
        return pd.DataFrame(rows, columns=[key, f"{fname}_ts", f"{sname}_ts"])

    def handle(
        kt: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        pending: list[float] = list(state.get[0]) if state.exists else []
        wm = state.getCurrentWatermarkMs() / 1000.0
        out: list[tuple[str, float, float | None]] = []

        if state.hasTimedOut:
            still = [a for a in pending if wm <= a + within_s]
            out = [(kt[0], a, None) for a in pending if wm > a + within_s]
        else:
            batch = pd.concat(list(pdfs), ignore_index=True).sort_values(sort_cols)
            fa = batch["_fa"].to_numpy()
            fb = batch["_fb"].to_numpy()
            tss = batch["_ts"].to_numpy()
            for r in range(len(batch)):
                ts = float(tss[r])
                if fb[r] and pending:
                    # this B is the NEXT second-match for every pending A
                    # strictly before it: resolves the on-time ones, emits
                    # the too-late ones (B against pending BEFORE the
                    # row's own A-flag: a row never resolves itself)
                    out.extend((kt[0], a, ts) for a in pending if ts > a + within_s)
                    pending = []
                if fa[r]:
                    pending.append(ts)
            # deadline may already have passed for old pendings (timer can
            # coalesce with data arrival)
            still = [a for a in pending if wm <= a + within_s]
            out.extend((kt[0], a, None) for a in pending if wm > a + within_s)

        if still:
            state.update((still,))
            at_ms = max(int((min(still) + within_s) * 1000), state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(at_ms)
        elif state.exists:
            state.remove()
        if out:
            yield _emit(out)

    return flagged.groupBy("_k").applyInPandasWithState(
        handle, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def stateful_match_runs(
    df: DataFrame,
    key: str,
    cond: Column,
    ts_col: str = "ts",
    tiebreakers: Sequence[str] = (),
    min_len: int = 1,
    watermark_delay: str | None = None,
    idle_close_s: float | None = None,
) -> DataFrame:
    """Streaming Kleene-plus (``A+``): emit each MAXIMAL run of consecutive
    ``cond``-matching rows per key, in the micro-batch where the run CLOSES
    — a non-matching row arrives after it (the exact batch-``match_runs``
    break), or, with ``idle_close_s``, the event-time timer fires once the
    watermark passes ``run_end + idle_close_s`` (the alert-at-idle behavior
    a monitor wants; Flink CEP state-TTL flavor). Without ``idle_close_s``
    a run left open at stream end is never emitted — exactly the rows where
    batch and an unbounded stream genuinely differ.

    State per key is ONE open run (start, end, count) — O(live keys), not
    O(history); closed runs leave no state. Same in-order-per-key contract
    as ``stateful_match_sequence`` (module docstring); under it, the
    emitted set with a break after every run equals the batch operator
    with the same ``min_len``.
    """
    if idle_close_s is not None and watermark_delay is None:
        raise ValueError("idle_close_s requires watermark_delay")
    use_timeouts = watermark_delay is not None

    src = df.withWatermark(ts_col, watermark_delay) if use_timeouts else df
    flagged = src.select(
        F.col(key).alias("_k"),
        *([F.col(ts_col)] if use_timeouts else []),
        F.col(ts_col).cast("double").alias("_ts"),
        *[F.col(c).cast("double").alias(f"_tb{i}") for i, c in enumerate(tiebreakers)],
        cond.cast("boolean").alias("_hit"),
    )
    sort_cols = ["_ts"] + [f"_tb{i}" for i in range(len(tiebreakers))]
    state_schema = T.StructType(
        [
            T.StructField("start", T.DoubleType()),
            T.StructField("end", T.DoubleType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    out_schema = T.StructType(
        [
            _key_field(df, key),
            T.StructField("run_start_ts", T.DoubleType()),
            T.StructField("run_end_ts", T.DoubleType()),
            T.StructField("run_len", T.LongType()),
        ]
    )

    def _emit(rows: list[tuple]) -> pd.DataFrame:
        return pd.DataFrame(rows, columns=[key, "run_start_ts", "run_end_ts", "run_len"])

    def handle(
        kt: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        run = tuple(state.get) if state.exists else None  # (start, end, cnt)
        out: list[tuple] = []

        if state.hasTimedOut:
            # idle horizon passed: the open run closes by timer
            if run is not None and run[2] >= min_len:
                out.append((kt[0], *run))
            state.remove()
            if out:
                yield _emit(out)
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(sort_cols)
        hits = batch["_hit"].to_numpy()
        tss = batch["_ts"].to_numpy()
        for r in range(len(batch)):
            ts = float(tss[r])
            if hits[r]:
                run = (ts, ts, 1) if run is None else (run[0], ts, run[2] + 1)
            elif run is not None:
                if run[2] >= min_len:
                    out.append((kt[0], *run))
                run = None
        if run is not None:
            state.update(run)
            if use_timeouts and idle_close_s is not None:
                at_ms = max(
                    int((run[1] + idle_close_s) * 1000),
                    state.getCurrentWatermarkMs() + 1,
                )
                state.setTimeoutTimestamp(at_ms)
        elif state.exists:
            state.remove()
        if out:
            yield _emit(out)

    timeout = (
        GroupStateTimeout.EventTimeTimeout if use_timeouts else GroupStateTimeout.NoTimeout
    )
    return flagged.groupBy("_k").applyInPandasWithState(
        handle, out_schema, state_schema, "append", timeout
    )
