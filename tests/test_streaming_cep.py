"""Streaming CEP (streaming/cep.py): cross-epoch completion, single
emission, and equivalence with the batch operator on the same input."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from arroyo_spark.operators import match_sequence
from arroyo_spark.streaming.cep import stateful_match_sequence

SCHEMA = "k string, ts timestamp, i int, ev string"


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(minutes=minute)


STEPS = lambda: [  # noqa: E731 — fresh Columns per call
    ("a", F.col("ev") == "A"),
    ("b", F.col("ev") == "B"),
    ("c", F.col("ev") == "C"),
]

EPOCH1 = [
    ("k1", _ts(1), 0, "A"),
    ("k2", _ts(1), 0, "B"),  # B before any A — dead unless an A arrives
    ("k3", _ts(1), 0, "A"),
]
EPOCH2 = [
    ("k1", _ts(2), 1, "B"),
    ("k1", _ts(3), 2, "C"),   # k1 completes here (A in epoch 1!)
    ("k2", _ts(2), 1, "A"),
    ("k3", _ts(30), 1, "B"),  # outside within=10min of k3's anchor
]
EPOCH3 = [
    ("k1", _ts(4), 3, "C"),   # post-completion rows must not re-emit
    ("k2", _ts(3), 2, "B"),
    ("k2", _ts(4), 3, "C"),   # k2 completes (chain anchored at its A)
    ("k3", _ts(31), 2, "C"),
]


def _run_stream(spark, tmp_path, epochs, within_s):
    src = tmp_path / "src"
    for i, rows in enumerate(epochs):
        d = src / f"epoch={i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(d))
        # FileStreamSource orders batches by file mtime — pin distinct,
        # increasing mtimes so epoch order is deterministic on fast writes
        for f in d.glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stateful_match_sequence(
        stream, key="k", steps=STEPS(), tiebreakers=["i"], within_s=within_s
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM cep_out").collect()


def test_eviction_bounds_state(spark, tmp_path):
    """With watermark timeouts: dead chains evicted at anchor+within (exact),
    completion tombstones at completion+evict_after_s, never-anchored keys
    write no state — the state store drains to zero rows."""
    epochs = [
        [
            ("done", _ts(0), 0, "A"),
            ("done", _ts(1), 1, "B"),
            ("done", _ts(2), 2, "C"),   # completes; tombstone until 00:02+60s
            ("dead", _ts(0), 0, "A"),   # anchored; dead once wm > 00:00+300s
            ("never", _ts(0), 0, "X"),  # never anchors -> no state at all
        ],
        [("never", _ts(60), 1, "X")],   # advances watermark to 01:00
        [("never", _ts(90), 2, "X")],   # wm=01:00 at this batch -> evict both
    ]
    src = tmp_path / "src"
    for i, rows in enumerate(epochs):
        d = src / f"epoch={i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(d))
        for f in d.glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stateful_match_sequence(
        stream,
        key="k",
        steps=STEPS(),
        tiebreakers=["i"],
        within_s=300.0,
        watermark_delay="0 seconds",
        evict_after_s=60.0,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM cep_evict").collect()
    assert [(r["k"], r["a_ts"], r["b_ts"], r["c_ts"]) for r in got] == [
        ("done", _ts(0).timestamp(), _ts(1).timestamp(), _ts(2).timestamp())
    ]
    state = q.lastProgress["stateOperators"][0]
    assert state["numRowsTotal"] == 0, state


def test_stateful_absence_timeout_and_late_resolution(spark, tmp_path):
    """Timeout detector: on-time B resolves silently; too-late B emits with
    its time; no-B emits via the event-time timer with null; state drains."""
    from arroyo_spark.streaming.cep import stateful_match_absence

    epochs = [
        [
            ("k1", _ts(0), 0, "T"),
            ("k2", _ts(0), 0, "T"),
            ("k2", _ts(2), 1, "R"),   # on time (within 5 min) -> silent
            ("k3", _ts(0), 0, "T"),
        ],
        [("k1", _ts(40), 1, "R")],    # too late -> emit (k1, 0, 40) now
        [("x", _ts(41), 0, "X")],     # watermark 40min > k3 deadline -> timer
    ]
    src = tmp_path / "src"
    for i, rows in enumerate(epochs):
        d = src / f"epoch={i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(d))
        for f in d.glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stateful_match_absence(
        stream,
        key="k",
        first=("t", F.col("ev") == "T"),
        second=("r", F.col("ev") == "R"),
        within_s=300.0,
        watermark_delay="0 seconds",
        tiebreakers=["i"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_absence")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["k"], r["t_ts"], r["r_ts"]) for r in spark.sql("SELECT * FROM cep_absence").collect()}
    assert got == {
        ("k1", _ts(0).timestamp(), _ts(40).timestamp()),
        ("k3", _ts(0).timestamp(), None),
    }
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 0


def test_stateful_match_completes_across_epochs(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [EPOCH1, EPOCH2, EPOCH3], within_s=600.0)
    rows = {r["k"]: (r["a_ts"], r["b_ts"], r["c_ts"]) for r in got}
    assert len(got) == len(rows) == 2  # k1 + k2, one emission each
    assert rows["k1"] == (_ts(1).timestamp(), _ts(2).timestamp(), _ts(3).timestamp())
    # k2's chain anchors at its epoch-2 A (the epoch-1 B is before any A)
    assert rows["k2"] == (_ts(2).timestamp(), _ts(3).timestamp(), _ts(4).timestamp())
    # k3 never completes: B/C fall outside within of its anchor


@pytest.mark.parametrize("within", [None, 600.0])
def test_stateful_match_equals_batch(spark, tmp_path, within):
    all_rows = EPOCH1 + EPOCH2 + EPOCH3
    batch = match_sequence(
        spark.createDataFrame(all_rows, SCHEMA),
        key="k",
        steps=STEPS(),
        tiebreakers=["i"],
        within=None if within is None else f"{int(within)} seconds",
    ).collect()
    want = {
        r["k"]: (r["a_ts"].timestamp(), r["b_ts"].timestamp(), r["c_ts"].timestamp())
        for r in batch
    }
    got_rows = _run_stream(spark, tmp_path, [EPOCH1, EPOCH2, EPOCH3], within_s=within)
    got = {r["k"]: (r["a_ts"], r["b_ts"], r["c_ts"]) for r in got_rows}
    assert got == want and len(got_rows) == len(got)


def _write_epochs(spark, tmp_path, epochs):
    src = tmp_path / "src"
    for i, rows in enumerate(epochs):
        d = src / f"epoch={i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(d))
        for f in d.glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )


def test_stateful_runs_closes_on_break_and_equals_batch(spark, tmp_path):
    """A run extended across epochs emits once when its break arrives, and
    the emitted set equals batch match_runs over the concatenated input
    (every run in this fixture is followed by a break)."""
    from arroyo_spark.operators import match_runs
    from arroyo_spark.streaming.cep import stateful_match_runs

    epochs = [
        [("k1", _ts(0), 0, "A"), ("k1", _ts(1), 1, "A"), ("k2", _ts(0), 0, "A")],
        [("k1", _ts(2), 2, "A"), ("k2", _ts(1), 1, "X")],  # k2's run closes
        [("k1", _ts(3), 3, "X"), ("k1", _ts(4), 4, "A"), ("k1", _ts(5), 5, "X")],
    ]
    stream = _write_epochs(spark, tmp_path, epochs)
    out = stateful_match_runs(
        stream, key="k", cond=F.col("ev") == "A", tiebreakers=["i"], min_len=2
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_runs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["run_start_ts"], r["run_end_ts"], r["run_len"])
        for r in spark.sql("SELECT * FROM cep_runs").collect()
    }
    # k1: [0,1,2] closed by the epoch-3 break; [4] filtered by min_len;
    # k2: [0] filtered by min_len
    assert got == {("k1", _ts(0).timestamp(), _ts(2).timestamp(), 3)}

    all_rows = [r for ep in epochs for r in ep]
    batch = match_runs(
        spark.createDataFrame(all_rows, SCHEMA),
        key="k",
        cond=F.col("ev") == "A",
        tiebreakers=["i"],
        min_len=2,
    ).collect()
    want = {
        (r["k"], r["run_start_ts"].timestamp(), r["run_end_ts"].timestamp(), r["run_len"])
        for r in batch
    }
    assert got == want


def test_stateful_runs_idle_timer_emits_open_run(spark, tmp_path):
    """With idle_close_s: a run with no break emits via the event-time timer
    once the watermark passes run_end + idle_close_s, and state drains."""
    from arroyo_spark.streaming.cep import stateful_match_runs

    epochs = [
        [("k1", _ts(0), 0, "A"), ("k1", _ts(1), 1, "A")],  # open run, no break
        [("x", _ts(30), 0, "X")],   # watermark -> 00:30 > 00:01 + 300s
        [("x", _ts(31), 1, "X")],   # timer fires in this batch
    ]
    stream = _write_epochs(spark, tmp_path, epochs)
    out = stateful_match_runs(
        stream,
        key="k",
        cond=F.col("ev") == "A",
        tiebreakers=["i"],
        min_len=2,
        watermark_delay="0 seconds",
        idle_close_s=300.0,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_runs_idle")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["run_start_ts"], r["run_end_ts"], r["run_len"])
        for r in spark.sql("SELECT * FROM cep_runs_idle").collect()
    }
    assert got == {("k1", _ts(0).timestamp(), _ts(1).timestamp(), 2)}
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 0


def test_stateful_match_bigint_key(spark, tmp_path):
    """Regression: the output key field carries the source column's type —
    a bigint key must emit, not crash Arrow serialization."""
    schema = "k bigint, ts timestamp, i int, ev string"
    rows = [(7, _ts(1), 0, "A"), (7, _ts(2), 1, "B"), (7, _ts(3), 2, "C")]
    src = tmp_path / "src"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / "epoch=0"))
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    out = stateful_match_sequence(stream, key="k", steps=STEPS(), tiebreakers=["i"])
    q = (
        out.writeStream.format("memory")
        .queryName("cep_bigint")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM cep_bigint").collect()
    assert [(r["k"], r["c_ts"]) for r in got] == [(7, _ts(3).timestamp())]
    assert dict(spark.sql("SELECT * FROM cep_bigint").dtypes)["k"] == "bigint"
