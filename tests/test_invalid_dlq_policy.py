"""Mid-pipeline InvalidMessage -> DLQ, CommitPolicy wiring, rate source.

Mirrors:
- /root/reference/tests/processing/strategies/test_all.py:217-297 — a
  strategy that raises InvalidMessage mid-pipeline routes the ORIGINAL
  message to the DLQ while the stream keeps committing.
- /root/reference/tests/processing/test_processor.py:380-515 — commit
  policy goldens (IMMEDIATE commits every batch; a frequency policy
  throttles commits against the clock).
"""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from arroyo_spark.operators import run_task_safe
from arroyo_spark.streaming import (
    CommitPolicy,
    ExactlyOnceSink,
    FileStreamSource,
    IMMEDIATE,
    OffsetsLedger,
    StreamProcessor,
    rate_source,
)
from arroyo_spark.synth import transcripts
from arroyo_spark.types import STREAM_SCHEMA

N_CONVS = 40
N_FILES = 5
PARTS = 4


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    import glob
    import shutil

    root = tmp_path_factory.mktemp("inv_src")
    flat = tmp_path_factory.mktemp("inv_flat")
    df = transcripts(spark, N_CONVS, partitions=PARTS).cache()
    hi = df.groupBy().max("offset").collect()[0][0]
    step = hi // N_FILES + 1
    for i in range(N_FILES):
        part = df.filter((F.col("offset") >= i * step) & (F.col("offset") < (i + 1) * step))
        part.coalesce(1).write.mode("overwrite").parquet(str(root / f"s{i}"))
        src = glob.glob(str(root / f"s{i}" / "part-*.parquet"))[0]
        shutil.copy(src, str(flat / f"{i:03d}.parquet"))
    df.unpersist()
    return str(flat)


def test_mid_pipeline_invalid_to_dlq_with_original_payload(spark, stream_dir, tmp_path):
    """A poison row inside a RunTask stage lands in the DLQ carrying its
    ORIGINAL payload; every epoch still commits (stream advances)."""

    # defined inside the test so cloudpickle ships it by VALUE (a module-
    # level fn would be pickled by reference — unimportable on workers)
    def poison_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if (pdf["turn_idx"] == 3).any():
            raise ValueError("poison turn")
        return pd.DataFrame({"n_chars": pdf["text"].str.len()})

    out = str(tmp_path / "out")
    ledger = OffsetsLedger(out, "inv")
    sink = ExactlyOnceSink(output_dir=f"{out}/inv", ledger=ledger)
    proc = StreamProcessor(
        spark=spark,
        source=FileStreamSource(stream_dir, STREAM_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=f"{out}/inv/ckpt",
        pipeline=lambda df: run_task_safe(df, poison_fn, {"n_chars": "long"}),
    )
    proc.run_until_complete()

    src = spark.read.schema(STREAM_SCHEMA).parquet(stream_dir)
    n_poison = src.filter(F.col("turn_idx") == 3).count()
    n_total = src.count()
    assert n_poison > 0

    assert len(ledger.epochs()) == N_FILES  # every epoch committed
    dlq = sink.read_dlq(spark)
    assert dlq.count() == n_poison
    reasons = {r["reason"] for r in dlq.select("reason").distinct().collect()}
    assert reasons == {"ValueError: poison turn"}

    # DLQ payloads are the ORIGINAL texts of the poison rows (not outputs)
    orig = {
        (r["partition"], r["offset"]): r["text"]
        for r in src.filter(F.col("turn_idx") == 3).collect()
    }
    for r in dlq.collect():
        assert orig[(r["original_partition"], r["original_offset"])] == r["payload"]

    data = sink.read_output(spark)
    assert data.count() == n_total - n_poison
    assert data.filter(F.col("turn_idx") == 3).count() == 0
    assert "n_chars" in data.columns and "_invalid_reason" not in data.columns


class FakeClock:
    def __init__(self, step: float = 0.4):
        self.t = 0.0
        self.step = step

    def __call__(self) -> float:
        self.t += self.step
        return self.t


@pytest.mark.parametrize(
    "policy,expected_commits",
    [
        (IMMEDIATE, N_FILES),  # min_commit_messages=1: every epoch flushes
        # 1s frequency, clock advances 0.4s/epoch after creation at t=0.4:
        # epochs at 0.8,1.2,1.6,2.0,2.4 -> only t=1.6 reaches the interval
        (CommitPolicy(1, None), 1),
    ],
)
def test_commit_policy_through_driver(spark, stream_dir, tmp_path, policy, expected_commits):
    """Reference commit-count goldens reproduced through the ACTUAL driver
    loop (policy wired by StreamProcessor into the sink's state machine)."""
    out = str(tmp_path / f"pol{expected_commits}")
    ledger = OffsetsLedger(out, "pol")
    sink = ExactlyOnceSink(output_dir=f"{out}/pol", ledger=ledger, clock=FakeClock())
    proc = StreamProcessor(
        spark=spark,
        source=FileStreamSource(stream_dir, STREAM_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=f"{out}/pol/ckpt",
        commit_policy=policy,
        trigger={"availableNow": True},  # drain in test; prod maps policy->trigger
    )
    proc.run_until_complete()
    assert len(ledger.epochs()) == N_FILES  # ledger rows are per-epoch regardless
    assert sink.n_policy_commits == expected_commits
    # the metric is recorded with the reference's name
    assert ledger.entries()[-1]["metrics"]["arroyo.consumer.commit.count"] == float(
        expected_commits
    )


def test_commit_policy_trigger_mapping():
    assert CommitPolicy(2.5, None).trigger_interval() == "2500 milliseconds"
    assert IMMEDIATE.trigger_interval() is None


def test_rate_source_through_exactly_once_sink(spark, tmp_path):
    """The source seam works end-to-end: a rate stream (decoded to the
    transcript schema with lineage) drains through the exactly-once sink."""
    out = str(tmp_path / "rate")
    ledger = OffsetsLedger(out, "rate")
    sink = ExactlyOnceSink(output_dir=f"{out}/rate", ledger=ledger)
    proc = StreamProcessor(
        spark=spark,
        source=rate_source(rows_per_second=200, num_partitions=4),
        sink=sink,
        checkpoint_dir=f"{out}/rate/ckpt",
        trigger={"processingTime": "1 second"},
    )
    q = proc.start()
    try:
        deadline = time.time() + 90
        n_rows = 0
        while time.time() < deadline and n_rows == 0:
            time.sleep(0.5)
            if ledger.epochs():
                try:
                    n_rows = sink.read_output(spark).count()
                except Exception:  # noqa: BLE001 — early epochs may be empty
                    n_rows = 0
    finally:
        q.stop()
    assert ledger.epochs(), "rate source never committed an epoch"
    got = sink.read_output(spark)
    assert {"conv_id", "turn_idx", "role", "text", "ts", "partition", "offset"} <= set(got.columns)
    assert got.count() > 0
