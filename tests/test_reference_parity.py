"""Differential parity against the ACTUAL reference implementation.

The north rule's correctness invariant is per-turn text equality under
stable (conv_id, turn_idx) ordering against the reference output for the
same input stream. ``tests/test_strategy_contract.py`` mirrors the
reference's own unit-test expectations; this module is stronger: it
imports the reference package from /root/reference (pure Python), drives
its REAL FilterStep / RunTask / Reduce / Unfold strategy objects
message-by-message over the same deterministic synthetic transcript
stream our Spark operators process, and asserts the two engines produce
equal rows — values, batch boundaries, and committed next-offsets.

The reference's kafka backend imports confluent_kafka (absent in this
container); the strategies themselves don't need it, so a minimal
import-time stub satisfies the type imports
(/root/reference/arroyo/processing/strategies/produce.py:6,
/root/reference/arroyo/backends/kafka/consumer.py:28-39). No reference
code is copied — it is EXECUTED, as the oracle.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

import pytest
from pyspark.sql import functions as F

if not os.path.isdir("/root/reference/arroyo"):
    pytest.skip(
        "reference checkout not present — differential oracle unavailable",
        allow_module_level=True,
    )

from arroyo_spark.operators import count_reduce, filter_step, run_task, unfold
from arroyo_spark.operators.map import run_task_pandas
from arroyo_spark.synth import transcripts


def _reference():
    """Import the reference strategies with a confluent_kafka stub installed."""
    import types

    if "confluent_kafka" not in sys.modules:
        stub = types.ModuleType("confluent_kafka")
        for name in (
            "Consumer", "KafkaError", "KafkaException", "Message", "Producer",
            "TopicPartition",
        ):
            setattr(stub, name, type(name, (object,), {}))
        for name in (
            "OFFSET_BEGINNING", "OFFSET_END", "OFFSET_INVALID", "OFFSET_STORED",
            "TIMESTAMP_NOT_AVAILABLE",
        ):
            setattr(stub, name, -1)
        sys.modules["confluent_kafka"] = stub
        admin = types.ModuleType("confluent_kafka.admin")
        for name in ("AdminClient", "NewTopic"):
            setattr(admin, name, type(name, (object,), {}))
        sys.modules["confluent_kafka.admin"] = admin
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")  # append: never shadow arroyo_spark
    import arroyo.processing.strategies as strategies
    import arroyo.types as ref_types

    return strategies, ref_types


class Capture:
    """Terminal strategy: records every submitted payload + committable."""

    def __init__(self) -> None:
        self.payloads = []
        self.committables = []

    def submit(self, message) -> None:
        self.payloads.append(message.payload)
        self.committables.append(dict(message.committable))

    def poll(self) -> None:
        pass

    def close(self) -> None:
        pass

    def terminate(self) -> None:
        pass

    def join(self, timeout=None) -> None:
        pass


@pytest.fixture(scope="module")
def turns(spark):
    """~400 deterministic turns with broker lineage, collected in delivery
    order (partition-major, offset order within each partition)."""
    df = (
        transcripts(spark, n_convs=60, seed=7, partitions=4, median_turns=6)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "partition", "offset")
        .cache()
    )
    rows = df.orderBy("partition", "offset").collect()
    assert len(rows) > 200
    yield df, rows
    df.unpersist()


def _drive(chain, ref_types, rows):
    """Submit every row to the reference chain as a broker-shaped message
    (committable carries the NEXT offset, the BrokerValue convention)."""
    topic = ref_types.Topic("transcripts")
    for r in rows:
        chain.submit(
            ref_types.Message(
                ref_types.Value(
                    r.asDict(),
                    {ref_types.Partition(topic, r.partition): r.offset + 1},
                    r.ts,
                )
            )
        )
    chain.poll()
    chain.close()
    chain.join()


def test_per_turn_text_parity_filter_runtask(spark, turns):
    """FilterStep -> RunTask in the reference vs filter_step -> run_task in
    Spark: identical per-turn text under (conv_id, turn_idx) ordering."""
    strategies, ref_types = _reference()
    df, rows = turns

    cap = Capture()
    chain = strategies.FilterStep(
        lambda m: m.payload["role"] != "system",
        strategies.RunTask(
            lambda m: {
                **m.payload,
                "text": m.payload["text"].upper() + " <" + m.payload["role"] + ">",
            },
            cap,
        ),
    )
    _drive(chain, ref_types, rows)
    ref_out = sorted((p["conv_id"], p["turn_idx"], p["text"]) for p in cap.payloads)

    spark_out = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in run_task(
            filter_step(df, F.col("role") != "system"),
            text=F.concat(F.upper("text"), F.lit(" <"), F.col("role"), F.lit(">")),
        )
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    assert len(spark_out) == len(ref_out) > 0
    assert spark_out == ref_out


def test_per_turn_text_parity_arrow_path(spark, turns):
    """Reference RunTask (per-message Python fn — the contract
    RunTaskWithMultiprocessing parallelizes) vs OUR Arrow-vectorized
    run_task_pandas: vectorization must not change per-turn text."""
    strategies, ref_types = _reference()
    df, rows = turns

    cap = Capture()
    _drive(
        strategies.RunTask(
            lambda m: {**m.payload, "text": " ".join(m.payload["text"].split()[:5])},
            cap,
        ),
        ref_types,
        rows,
    )
    ref_out = sorted((p["conv_id"], p["turn_idx"], p["text"]) for p in cap.payloads)

    def first5(pdf):
        pdf = pdf.copy()
        pdf["text"] = pdf["text"].str.split().str[:5].str.join(" ")
        return pdf

    spark_out = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in run_task_pandas(df, first5).select("conv_id", "turn_idx", "text").collect()
    )
    assert spark_out == ref_out


def test_reduce_count_flush_parity(spark, turns):
    """Reference Reduce (count-based flush, join() force-flushes the tail)
    vs count_reduce: identical batch contents, boundaries, and
    committed next-offsets on the same single-partition stream."""
    strategies, ref_types = _reference()
    df, rows = turns
    p0_rows = [r for r in rows if r.partition == 0]
    batch = 7

    cap = Capture()
    _drive(
        strategies.Reduce(
            batch,
            1e9,  # time flush disabled: count semantics only
            lambda acc, v: acc + [(v.payload["offset"], v.payload["turn_idx"])],
            list,
            cap,
        ),
        ref_types,
        p0_rows,
    )
    ref_batches = cap.payloads
    part0 = ref_types.Partition(ref_types.Topic("transcripts"), 0)
    ref_next = [c[part0] for c in cap.committables]

    out = (
        count_reduce(
            df.filter(F.col("partition") == 0),
            batch,
            {"items": F.array_sort(F.collect_list(F.struct("offset", "turn_idx")))},
        )
        .orderBy("batch_id")
        .collect()
    )
    spark_batches = [[(e["offset"], e["turn_idx"]) for e in r["items"]] for r in out]
    spark_next = [r["next_offset"] for r in out]

    assert len(p0_rows) % batch != 0, "pick sizes that exercise the partial tail"
    assert spark_batches == ref_batches
    assert spark_next == ref_next


def test_reduce_weighted_flush_parity(spark, turns):
    """compute_batch_size (weighted) reduce: the reference's weight
    accumulator vs our Arrow-batched per-partition assignment — identical
    boundaries when a message's weight closes the batch."""
    strategies, ref_types = _reference()
    df, rows = turns
    p1_rows = [r for r in rows if r.partition == 1]
    max_weight = 40  # words per flushed batch

    def weight_of(payload) -> int:
        return len(payload["text"].split())

    cap = Capture()
    _drive(
        strategies.Reduce(
            max_weight,
            1e9,
            lambda acc, v: acc + [v.payload["offset"]],
            list,
            cap,
            compute_batch_size=lambda v: weight_of(v.payload),
        ),
        ref_types,
        p1_rows,
    )
    ref_batches = cap.payloads

    out = (
        count_reduce(
            df.filter(F.col("partition") == 1),
            max_weight,
            {"items": F.array_sort(F.collect_list("offset"))},
            weight=F.size(F.split("text", " ")),
        )
        .orderBy("batch_id")
        .collect()
    )
    spark_batches = [list(r["items"]) for r in out]
    assert len(spark_batches) > 2
    assert spark_batches == ref_batches


def test_batch_unbatch_commit_parity_with_ledger(spark, turns, tmp_path):
    """Reference BatchStep -> UnbatchStep -> CommitOffsets vs our streaming
    path (FileStreamSource -> ExactlyOnceSink): the reference's finally-
    committed per-partition offsets equal our ledger's committed
    next-offsets for the same stream, and the batch/unbatch roundtrip
    preserves exactly the per-turn rows the sink commits."""
    strategies, ref_types = _reference()
    from arroyo_spark.streaming import (
        ExactlyOnceSink,
        FileStreamSource,
        OffsetsLedger,
        StreamProcessor,
    )
    from arroyo_spark.types import STREAM_SCHEMA

    df, rows = turns

    # reference: staged-commit capture (the consumer's Commit contract)
    staged = {}

    def commit(offsets, force=False):
        staged.update(offsets)

    roundtrip = Capture()

    class Tee(Capture):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def submit(self, message):
            super().submit(message)
            self.inner.submit(message)

        def join(self, timeout=None):
            self.inner.join(timeout)

    tee = Tee(strategies.CommitOffsets(commit))
    chain = strategies.BatchStep(25, 1e9, strategies.UnbatchStep(tee))
    _drive(chain, ref_types, rows)
    ref_committed = {p.index: off for p, off in staged.items()}
    ref_rows = sorted((p["conv_id"], p["turn_idx"], p["text"]) for p in tee.payloads)

    # our engine: same rows through the streaming path (identity transform)
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    slices = 3
    hi = max(r.offset for r in rows)
    step = hi // slices + 1
    import glob
    import shutil

    for i in range(slices):
        part = df.filter((F.col("offset") >= i * step) & (F.col("offset") < (i + 1) * step))
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"s{i}"))
        shutil.copy(
            glob.glob(str(tmp_path / f"s{i}" / "part-*.parquet"))[0],
            str(src_dir / f"{i:03d}.parquet"),
        )
    ledger = OffsetsLedger(str(tmp_path), "refparity")
    sink = ExactlyOnceSink(output_dir=str(tmp_path / "out"), ledger=ledger)
    StreamProcessor(
        spark=spark,
        source=FileStreamSource(str(src_dir), STREAM_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).run_until_complete()

    assert ledger.committed_offsets() == ref_committed
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in sink.read_output(spark).select("conv_id", "turn_idx", "text").collect()
    )
    assert got == ref_rows


def test_fully_filtered_stream_commits_parity(spark, turns, tmp_path):
    """The FilteredPayload sentinel contract, differentially: a reference
    FilterStep that drops EVERY message (IMMEDIATE commit policy) still
    advances offsets through CommitOffsets; our ledger advances through a
    100%-filtered stream via epoch-range commits. Same final committed
    offsets, zero output rows, both engines."""
    strategies, ref_types = _reference()
    from arroyo.commit import IMMEDIATE

    from arroyo_spark.streaming import (
        ExactlyOnceSink,
        FileStreamSource,
        OffsetsLedger,
        StreamProcessor,
    )
    from arroyo_spark.types import STREAM_SCHEMA

    df, rows = turns

    staged = {}

    def commit(offsets, force=False):
        staged.update(offsets)

    chain = strategies.FilterStep(
        lambda m: False,
        strategies.CommitOffsets(commit),
        commit_policy=IMMEDIATE,
    )
    _drive(chain, ref_types, rows)
    ref_committed = {p.index: off for p, off in staged.items()}
    assert ref_committed, "sentinels must have advanced offsets"

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    import glob
    import shutil

    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "all"))
    shutil.copy(
        glob.glob(str(tmp_path / "all" / "part-*.parquet"))[0],
        str(src_dir / "000.parquet"),
    )
    ledger = OffsetsLedger(str(tmp_path), "filtered")
    # the filter lives in the sink transform: the sink computes offset
    # lineage from the RAW batch, so a 100%-filtered epoch still commits
    # its offset range — the engine's FilteredPayload-sentinel equivalent
    sink = ExactlyOnceSink(
        output_dir=str(tmp_path / "out"),
        ledger=ledger,
        transform=lambda d: d.filter(F.lit(False)),
    )
    StreamProcessor(
        spark=spark,
        source=FileStreamSource(str(src_dir), STREAM_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).run_until_complete()

    assert ledger.committed_offsets() == ref_committed
    assert sink.read_output(spark).count() == 0


def test_reference_stream_processor_e2e_parity(spark, turns, tmp_path):
    """Capstone differential: the reference's REAL StreamProcessor driving
    its LocalBroker (in-memory storage) end-to-end — subscribe, assignment,
    poll loop, strategy DAG, staged commits, shutdown flush — over the same
    transcript stream our StreamProcessor+ExactlyOnceSink processes.
    Asserts equal per-turn transformed text AND equal finally-committed
    per-partition offsets (the north rule's row-set + offset invariants,
    checked against the reference's own driver loop, not a mirror of it)."""
    strategies, ref_types = _reference()
    from arroyo.backends.local.backend import LocalBroker
    from arroyo.backends.local.storages.memory import MemoryMessageStorage
    from arroyo.commit import IMMEDIATE
    from arroyo.processing.processor import StreamProcessor as RefStreamProcessor
    from arroyo.processing.strategies.abstract import ProcessingStrategyFactory

    from arroyo_spark.streaming import (
        ExactlyOnceSink,
        FileStreamSource,
        OffsetsLedger,
        StreamProcessor,
    )
    from arroyo_spark.types import STREAM_SCHEMA

    df, rows = turns
    topic = ref_types.Topic("transcripts")
    n_parts = 4

    storage = MemoryMessageStorage()
    storage.create_topic(topic, n_parts)
    broker = LocalBroker(storage)
    # produce in per-partition offset order so broker offsets == synth offsets
    for r in rows:
        bv = broker.produce(ref_types.Partition(topic, r.partition), r.asDict())
        assert bv.offset == r.offset

    class Forward(Capture):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def submit(self, message):
            super().submit(message)
            self.inner.submit(message)

        def poll(self):
            self.inner.poll()

        def close(self):
            self.inner.close()

        def join(self, timeout=None):
            self.inner.join(timeout)

    committed = {}
    captured = []

    class Factory(ProcessingStrategyFactory):
        def create_with_partitions(self, commit, partitions):
            def recording_commit(offsets, force=False):
                committed.update(offsets)
                return commit(offsets, force=force)

            cap = Forward(strategies.CommitOffsets(recording_commit))
            captured.append(cap)
            return strategies.FilterStep(
                lambda m: m.payload["role"] != "system",
                strategies.RunTask(
                    lambda m: {
                        **m.payload,
                        "text": m.payload["text"].upper() + " <" + m.payload["role"] + ">",
                    },
                    cap,
                ),
            )

    consumer = broker.get_consumer("parity-group")
    processor = RefStreamProcessor(consumer, topic, Factory(), IMMEDIATE)
    for _ in range(len(rows) + 20):
        processor._run_once()
    processor._shutdown()

    ref_committed = {p.index: off for p, off in committed.items()}
    ref_rows = sorted(
        (p["conv_id"], p["turn_idx"], p["text"])
        for cap in captured
        for p in cap.payloads
        if isinstance(p, dict)  # skip FilteredPayload sentinels
    )
    assert len(ref_rows) > 200
    assert set(ref_committed) == set(range(n_parts))

    # our engine: same stream, same transform, through the streaming path
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    import glob
    import shutil

    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "all"))
    shutil.copy(
        glob.glob(str(tmp_path / "all" / "part-*.parquet"))[0],
        str(src_dir / "000.parquet"),
    )
    ledger = OffsetsLedger(str(tmp_path), "e2e")
    sink = ExactlyOnceSink(
        output_dir=str(tmp_path / "out"),
        ledger=ledger,
        transform=lambda d: d.filter(F.col("role") != "system").withColumn(
            "text", F.concat(F.upper("text"), F.lit(" <"), F.col("role"), F.lit(">"))
        ),
    )
    StreamProcessor(
        spark=spark,
        source=FileStreamSource(str(src_dir), STREAM_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).run_until_complete()

    assert ledger.committed_offsets() == ref_committed
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in sink.read_output(spark).select("conv_id", "turn_idx", "text").collect()
    )
    assert got == ref_rows


def test_dlq_routing_parity(spark, turns, tmp_path):
    """DLQ differential: the reference processor's InvalidMessage ->
    BufferedMessages -> DlqProducer path vs our run_task_safe poison-row
    capture -> sink DLQ split. Same poisoned turns (turn_idx % 23 == 5):
    identical DLQ'd (partition, offset, ORIGINAL payload) sets, identical
    committed offsets (invalid offsets still commit), and identical
    surviving transformed rows."""
    strategies, ref_types = _reference()
    from arroyo.backends.local.backend import LocalBroker
    from arroyo.backends.local.storages.memory import MemoryMessageStorage
    from arroyo.commit import IMMEDIATE
    from arroyo.dlq import DlqPolicy, InvalidMessage, NoopDlqProducer
    from arroyo.processing.processor import StreamProcessor as RefStreamProcessor
    from arroyo.processing.strategies.abstract import ProcessingStrategyFactory

    from arroyo_spark.operators.map import run_task_safe
    from arroyo_spark.streaming import (
        ExactlyOnceSink,
        FileStreamSource,
        OffsetsLedger,
        StreamProcessor,
    )
    from arroyo_spark.types import STREAM_SCHEMA

    df, rows = turns
    topic = ref_types.Topic("transcripts")
    storage = MemoryMessageStorage()
    storage.create_topic(topic, 4)
    broker = LocalBroker(storage)
    for r in rows:
        broker.produce(ref_types.Partition(topic, r.partition), r.asDict())

    dlqd = []

    class CaptureDlq(NoopDlqProducer):
        def produce(self, value, reason=None):
            dlqd.append((value.partition.index, value.offset, value.payload["text"]))
            return super().produce(value, reason)

    committed = {}
    captured = []

    class Factory(ProcessingStrategyFactory):
        def create_with_partitions(self, commit, partitions):
            def recording_commit(offsets, force=False):
                committed.update(offsets)
                return commit(offsets, force=force)

            def fn(m):
                if m.payload["turn_idx"] % 23 == 5:
                    raise InvalidMessage(
                        m.value.partition, m.value.offset, reason="poison"
                    )
                return {**m.payload, "text": m.payload["text"].upper()}

            cap = Capture()
            captured.append(cap)
            return strategies.RunTask(
                fn, _Fan(cap, strategies.CommitOffsets(recording_commit))
            )

    class _Fan(Capture):
        """forward to capture AND commit."""

        def __init__(self, cap, inner):
            super().__init__()
            self.cap = cap
            self.inner = inner

        def submit(self, message):
            self.cap.submit(message)
            self.inner.submit(message)

        def poll(self):
            self.inner.poll()

        def close(self):
            self.inner.close()

        def join(self, timeout=None):
            self.inner.join(timeout)

    consumer = broker.get_consumer("dlq-parity")
    processor = RefStreamProcessor(
        consumer, topic, Factory(), IMMEDIATE, DlqPolicy(producer=CaptureDlq())
    )
    for _ in range(len(rows) + 20):
        processor._run_once()
    processor._shutdown()

    ref_committed = {p.index: off for p, off in committed.items()}
    ref_dlq = sorted(dlqd)
    ref_ok = sorted(
        (p["conv_id"], p["turn_idx"], p["text"])
        for c in captured
        for p in c.payloads
        if isinstance(p, dict)
    )
    assert len(ref_dlq) > 5
    assert ref_ok

    # our engine: poison capture in the pipeline, DLQ split in the sink
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    import glob
    import shutil

    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "all"))
    shutil.copy(
        glob.glob(str(tmp_path / "all" / "part-*.parquet"))[0],
        str(src_dir / "000.parquet"),
    )

    def poison_fn(pdf):
        import pandas as pd

        if (pdf["turn_idx"] % 23 == 5).any():
            raise ValueError("poison")
        return pd.DataFrame({"text_up": pdf["text"].str.upper()})

    ledger = OffsetsLedger(str(tmp_path), "dlqparity")
    sink = ExactlyOnceSink(output_dir=str(tmp_path / "out"), ledger=ledger)
    StreamProcessor(
        spark=spark,
        source=FileStreamSource(str(src_dir), STREAM_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        pipeline=lambda d: run_task_safe(d, poison_fn, {"text_up": "string"}),
    ).run_until_complete()

    assert ledger.committed_offsets() == ref_committed
    got_dlq = sorted(
        (r.original_partition, r.original_offset, r.payload)
        for r in sink.read_dlq(spark).collect()
    )
    assert got_dlq == ref_dlq
    got_ok = sorted(
        (r.conv_id, r.turn_idx, r.text_up)
        for r in sink.read_output(spark).select("conv_id", "turn_idx", "text_up").collect()
    )
    assert got_ok == ref_ok


def test_produce_topic_roundtrip_parity(spark, turns, tmp_path):
    """Produce differential: reference RunTask -> Produce(LocalProducer) ->
    CommitOffsets lands transformed payloads on a broker topic; our
    PipeTopic sink commits them as readable epochs. Same transform, same
    stream: identical topic contents and committed offsets."""
    strategies, ref_types = _reference()
    from arroyo.backends.local.backend import LocalBroker
    from arroyo.backends.local.storages.memory import MemoryMessageStorage

    from arroyo_spark.streaming import FileStreamSource, OffsetsLedger, StreamProcessor
    from arroyo_spark.streaming.produce import PipeTopic
    from arroyo_spark.types import STREAM_SCHEMA

    df, rows = turns
    in_topic = ref_types.Topic("in")
    out_topic = ref_types.Topic("out")
    storage = MemoryMessageStorage()
    storage.create_topic(in_topic, 4)
    storage.create_topic(out_topic, 1)  # single partition: deterministic read-back
    broker = LocalBroker(storage)

    committed = {}

    def commit(offsets, force=False):
        committed.update(offsets)

    chain = strategies.RunTask(
        lambda m: {**m.payload, "text": m.payload["text"].lower().strip()},
        strategies.Produce(
            broker.get_producer(), out_topic, strategies.CommitOffsets(commit)
        ),
    )
    _drive(chain, ref_types, rows)
    ref_produced = []
    off = 0
    part0 = ref_types.Partition(out_topic, 0)
    while True:
        bv = storage.consume(part0, off)
        if bv is None:
            break
        ref_produced.append((bv.payload["conv_id"], bv.payload["turn_idx"], bv.payload["text"]))
        off += 1
    ref_produced.sort()
    assert len(ref_produced) == len(rows)

    # our engine: same transform through a PipeTopic sink, read back from
    # the topic the way a downstream consumer would
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    import glob
    import shutil

    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "all"))
    shutil.copy(
        glob.glob(str(tmp_path / "all" / "part-*.parquet"))[0],
        str(src_dir / "000.parquet"),
    )
    topic = PipeTopic(str(tmp_path / "topics"), "t1")
    sink = topic.sink(
        transform=lambda d: d.withColumn("text", F.lower(F.trim("text")))
    )
    StreamProcessor(
        spark=spark,
        source=FileStreamSource(str(src_dir), STREAM_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).run_until_complete()

    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in sink.read_output(spark).select("conv_id", "turn_idx", "text").collect()
    )
    assert got == ref_produced
    assert sink.ledger.committed_offsets() == {
        p.index: o for p, o in committed.items()
    }


def test_unfold_token_stream_parity(spark, turns):
    """Reference Unfold over a python tokenizer vs our unfold(word_tokens):
    same (conv_id, turn_idx, token) multiset."""
    strategies, ref_types = _reference()
    from arroyo_spark.functions import word_tokens

    df, rows = turns

    def tokens(payload):
        return [
            ref_types.Value((payload["conv_id"], payload["turn_idx"], t), {}, None)
            for t in re.split(r"[^a-z0-9]+", payload["text"].lower())
            if t != ""
        ]

    cap = Capture()
    _drive(strategies.Unfold(lambda payload: tokens(payload), cap), ref_types, rows)
    ref_counter = Counter(cap.payloads)

    spark_counter = Counter(
        (r.conv_id, r.turn_idx, r.tok)
        for r in unfold(
            df, word_tokens("text"), alias="tok", keep=["conv_id", "turn_idx"]
        ).collect()
    )
    assert sum(ref_counter.values()) > 1000
    assert spark_counter == ref_counter
