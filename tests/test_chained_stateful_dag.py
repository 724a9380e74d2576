"""Chained stateful DAG — the north star's composite pipeline.

SURVEY.md §7 hard thing #4: session windows + a stateful stream-stream
join cannot share one Spark query (one watermark domain per query), so the
engine composes them as TWO queries through a PipeTopic — the reference's
mid-pipeline Produce (arroyo/processing/strategies/produce.py:23-167):

  turns ─┐
         ├─ stage 1: stream_correlate (stateful interval join) ─ topic ─
  calls ─┘
  topic ─ stage 2: session_window_stream keyed by conv_id ─ final sink

Assertions: the chained committed row set equals the single-session batch
computation over the same input, and it survives a mid-chain crash-restart
of stage 2 exactly-once. Watermark propagation across the hop is driven by
the data itself (the far-future sentinel row flows through stage 1's
output and closes stage 2's sessions) — exactly how a production chain
advances.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from arroyo_spark.operators.join import stream_correlate
from arroyo_spark.operators.reduce import session_window_stream
from arroyo_spark.streaming import (
    ExactlyOnceSink,
    FileStreamSource,
    OffsetsLedger,
    PipeTopic,
    StreamProcessor,
)

T0 = datetime(2024, 1, 1)
TURN_SCHEMA = "conv_id string, turn_idx int, role string, tool string, ts timestamp"
CALL_SCHEMA = "conv_id string, turn_idx int, call_id string, status string, ts timestamp"


def _write_slices(spark, root, name, schema, slices):
    import glob
    import shutil

    src = root / name
    src.mkdir()
    for i, rows in enumerate(slices):
        df = spark.createDataFrame(rows, schema)
        tmp = str(root / f"_{name}{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], str(src / f"{i:03d}.parquet"))
    return str(src)


def m(minute: float) -> datetime:
    return T0 + timedelta(minutes=minute)


@pytest.fixture()
def dag_dirs(spark, tmp_path):
    """Turn/call slices with two sessions for conv a, one for conv b, and a
    far-future sentinel pair that advances every watermark at the end."""
    tool = lambda c, i, mins: (c, i, "tool", "search", m(mins))  # noqa: E731
    call = lambda c, i, st, mins: (c, i, f"{c}#{i}", st, m(mins))  # noqa: E731
    turn_slices = [
        # conv a session 1 (calls at ~0-4 min), conv b session 1
        [tool("a", 0, 0.0), tool("a", 1, 2.0), tool("b", 0, 1.0)],
        # conv a session 2 after a >5 min call-time gap
        [tool("a", 2, 15.0), tool("a", 3, 16.0)],
        # sentinel: closes all sessions once it flows through the join
        [tool("zz", 0, 240.0)],
    ]
    call_slices = [
        [call("a", 0, "ok", 0.5), call("a", 1, "error", 2.5), call("b", 0, "ok", 1.5)],
        [call("a", 2, "ok", 15.5), call("a", 3, "ok", 16.5)],
        [call("zz", 0, "ok", 240.5)],
    ]
    turns_dir = _write_slices(spark, tmp_path, "turns", TURN_SCHEMA, turn_slices)
    calls_dir = _write_slices(spark, tmp_path, "calls", CALL_SCHEMA, call_slices)
    return turns_dir, calls_dir


def _stage2_plan(df):
    return session_window_stream(
        df,
        "5 minutes",
        aggs={
            "n_calls": F.count(F.lit(1)),
            "n_errors": F.sum(F.when(F.col("status") == "error", 1).otherwise(0)),
        },
        keys=["conv_id"],
        ts_col="call_ts",
        watermark="1 minute",
    ).select(
        F.col("win.start").alias("sess_start"),
        F.col("win.end").alias("sess_end"),
        "conv_id",
        "n_calls",
        "n_errors",
    )


class _CrashingSink(ExactlyOnceSink):
    crash_after = 1

    def __call__(self, batch_df, epoch_id):
        if len(self.ledger.epochs()) >= self.crash_after:
            raise RuntimeError("injected mid-chain crash")
        super().__call__(batch_df, epoch_id)


def test_chained_stateful_dag_exactly_once_across_restart(spark, dag_dirs, tmp_path):
    turns_dir, calls_dir = dag_dirs
    root = str(tmp_path / "dag")

    # ---- stage 1: stateful interval join -> PipeTopic ------------------
    topic = PipeTopic(root, "corr")
    turns_src = FileStreamSource(turns_dir, TURN_SCHEMA, max_files_per_trigger=1)
    calls_src = FileStreamSource(calls_dir, CALL_SCHEMA, max_files_per_trigger=1)
    StreamProcessor(
        spark=spark,
        source=lambda s: stream_correlate(
            turns_src(s), calls_src(s), watermark="10 minutes", max_call_delay="2 minutes"
        ),
        sink=topic.sink(),
        checkpoint_dir=f"{root}/corr/ckpt",
    ).run_until_complete(timeout=300)

    corr_batch = topic.sink().read_output(spark)
    # every non-sentinel call correlated (all placed within 2 min of turn)
    assert corr_batch.filter(F.col("conv_id") != "zz").count() == 5

    # ---- stage 2: session windows over the topic, crash mid-chain ------
    ledger2 = OffsetsLedger(root, "sess")
    crash_sink = _CrashingSink(output_dir=f"{root}/sess", ledger=ledger2)
    src2 = topic.source(spark, max_files_per_trigger=4)
    with pytest.raises(Exception, match="injected mid-chain crash"):
        StreamProcessor(
            spark=spark,
            source=src2,
            sink=crash_sink,
            checkpoint_dir=f"{root}/sess/ckpt",
            pipeline=_stage2_plan,
        ).run_until_complete(timeout=300)
    assert len(ledger2.epochs()) == 1  # partial progress committed

    # restart from the same checkpoint with a healthy sink
    sink2 = ExactlyOnceSink(output_dir=f"{root}/sess", ledger=ledger2)
    StreamProcessor(
        spark=spark,
        source=topic.source(spark, max_files_per_trigger=4),
        sink=sink2,
        checkpoint_dir=f"{root}/sess/ckpt",
        pipeline=_stage2_plan,
    ).run_until_complete(timeout=300)

    got = {
        (r.conv_id, r.sess_start): (r.sess_end, r.n_calls, r.n_errors)
        for r in sink2.read_output(spark).collect()
    }

    # expected session structure (hand-placed fixtures)
    assert got[("a", m(0.5))] == (m(7.5), 2, 1)  # calls 0.5, 2.5 -> end 2.5+5
    assert got[("b", m(1.5))] == (m(6.5), 1, 0)
    assert got[("a", m(15.5))] == (m(21.5), 2, 0)  # second session, 16-min gap
    assert ("zz", m(240.5)) not in got  # sentinel session never closes

    # chained committed rows == single-session BATCH computation over the
    # same committed stage-1 output (batch session_window, no watermark),
    # restricted to closed (emitted) sessions
    want = {
        (r.conv_id, r.sess_start): (r.sess_end, r.n_calls, r.n_errors)
        for r in corr_batch.groupBy(
            F.session_window("call_ts", "5 minutes").alias("win"), "conv_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias("n_errors"),
        )
        .select(
            F.col("win.start").alias("sess_start"),
            F.col("win.end").alias("sess_end"),
            "conv_id",
            "n_calls",
            "n_errors",
        )
        .collect()
    }
    for k, v in got.items():
        assert want[k] == v, k
    assert set(want) - set(got) == {("zz", m(240.5))}  # only the open session
