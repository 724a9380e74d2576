"""Incremental dedup through the exactly-once streaming path.

The training-data-pipeline composition VERDICT r3 asked for: per-epoch new
documents deduped against the accumulated fingerprint store (the sink's own
committed output), asserting the committed keep-set equals batch dedup over
the full corpus and survives a crash-restart. Mirrors
test_chained_stateful_dag's structure: deterministic file-per-epoch source,
ledger-committed epochs, injected mid-stream crash.
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from arroyo_spark.operators.dedup import exact_dedup
from arroyo_spark.streaming import (
    ExactlyOnceSink,
    FileStreamSource,
    OffsetsLedger,
    StreamProcessor,
)
from arroyo_spark.streaming.incremental import epoch_dedup_transform, incremental_dedup_sink

DOC_SCHEMA = "doc_id bigint, text string"

# four epochs; duplicates within epochs AND across epochs; first arrival
# of every text also has the lowest doc_id so the streaming first-wins
# keep rule coincides with batch exact_dedup's min-id rule
EPOCHS = [
    [(0, "alpha beta"), (1, "gamma"), (2, "alpha beta")],  # in-epoch dup
    [(3, "delta"), (4, "gamma"), (5, "epsilon")],  # cross-epoch dup (gamma)
    [(6, "alpha  beta"), (7, "zeta")],  # dup after normalization
    [(8, "delta"), (9, "eta"), (10, "gamma")],  # two cross-epoch dups
]
UNIQUE_TEXTS = 6  # alpha-beta, gamma, delta, epsilon, zeta, eta


@pytest.fixture()
def doc_stream_dir(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    for i, rows in enumerate(EPOCHS):
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        tmp = str(tmp_path / f"_e{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], str(src / f"{i:03d}.parquet"))
    return str(src)


def _corpus(spark):
    rows = [r for ep in EPOCHS for r in ep]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _run(spark, doc_stream_dir, out, sink):
    proc = StreamProcessor(
        spark=spark,
        source=FileStreamSource(doc_stream_dir, DOC_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=f"{out}/ckpt",
    )
    proc.run_until_complete()


def test_incremental_dedup_equals_batch(spark, doc_stream_dir, tmp_path):
    out = str(tmp_path / "store")
    ledger = OffsetsLedger(str(tmp_path), "dedup")
    sink = incremental_dedup_sink(out, ledger)
    _run(spark, doc_stream_dir, out, sink)

    assert len(ledger.epochs()) == len(EPOCHS)
    got = sink.read_output(spark)
    batch = exact_dedup(_corpus(spark), "doc_id", "text")

    # exactly one keeper per fingerprint, same fingerprint set as batch,
    # and (first-arrival == min-id here) the same keeper rows
    got_rows = sorted((r["fingerprint"], r["doc_id"]) for r in got.collect())
    want_rows = sorted((r["fingerprint"], r["keep_id"]) for r in batch.collect())
    assert got_rows == want_rows
    assert got.count() == UNIQUE_TEXTS
    # the keeper for 'gamma' is its FIRST arrival (doc 1), not a later dup
    gamma = [r for r in got.collect() if r["text"] == "gamma"]
    assert [g["doc_id"] for g in gamma] == [1]


class _CrashAfter(ExactlyOnceSink):
    crash_after = 2

    def __call__(self, batch_df, epoch_id):
        if len(self.ledger.epochs()) >= self.crash_after:
            raise RuntimeError("injected crash")
        super().__call__(batch_df, epoch_id)


def test_incremental_dedup_crash_restart_exactly_once(spark, doc_stream_dir, tmp_path):
    out = str(tmp_path / "store")
    ledger = OffsetsLedger(str(tmp_path), "dedup")
    crash_sink = _CrashAfter(output_dir=out, ledger=ledger)
    crash_sink.transform = epoch_dedup_transform(crash_sink)
    with pytest.raises(Exception, match="injected crash"):
        _run(spark, doc_stream_dir, out, crash_sink)
    assert len(ledger.epochs()) == 2  # partial progress

    # restart on the same checkpoint + ledger with a healthy sink
    sink2 = incremental_dedup_sink(out, ledger)
    _run(spark, doc_stream_dir, out, sink2)

    assert len(ledger.epochs()) == len(EPOCHS)
    got = sorted(
        (r["fingerprint"], r["doc_id"]) for r in sink2.read_output(spark).collect()
    )
    want = sorted(
        (r["fingerprint"], r["keep_id"])
        for r in exact_dedup(_corpus(spark), "doc_id", "text").collect()
    )
    assert got == want  # crash+restart committed the same keep-set once


def test_incremental_dedup_replay_sees_only_committed_store(spark, doc_stream_dir, tmp_path):
    """A replayed epoch must dedupe against exactly the epochs committed
    BEFORE it — its own (possibly partial) output is invisible."""
    out = str(tmp_path / "store")
    ledger = OffsetsLedger(str(tmp_path), "dedup")
    sink = incremental_dedup_sink(out, ledger)
    _run(spark, doc_stream_dir, out, sink)
    before = sorted(map(tuple, sink.read_output(spark).collect()))
    # re-deliver an already-committed epoch: idempotent no-op
    sink(spark.createDataFrame(EPOCHS[1], DOC_SCHEMA), epoch_id=ledger.epochs()[1])
    after = sorted(map(tuple, sink.read_output(spark).collect()))
    assert before == after


# ---------------------------------------------------------------------------
# Incremental MinHash-LSH near-dup dedup
# ---------------------------------------------------------------------------
NEAR_EPOCHS = [
    # near-dup pairs share most 3-shingles -> same minhash bands
    [(0, "the quick brown fox jumps over the lazy dog today"),
     (1, "an entirely different document about spark streaming engines"),
     (2, "the quick brown fox jumps over the lazy dog today!")],  # near-dup of 0
    [(3, "another unrelated text with its own vocabulary entirely"),
     (4, "an entirely different document about spark streaming engines ok")],  # near-dup of 1
    [(5, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 0
     (6, "completely fresh content never seen before in any epoch")],
]


@pytest.fixture()
def near_stream_dir(spark, tmp_path):
    src = tmp_path / "near"
    src.mkdir()
    for i, rows in enumerate(NEAR_EPOCHS):
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        tmp = str(tmp_path / f"_n{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], str(src / f"{i:03d}.parquet"))
    return str(src)


def _near_corpus(spark):
    rows = [r for ep in NEAR_EPOCHS for r in ep]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_incremental_minhash_equals_batch_rule(spark, near_stream_dir, tmp_path):
    from arroyo_spark.streaming.incremental import (
        batch_minhash_keep_set,
        incremental_minhash_sink,
        minhash_keep_set,
    )

    out = str(tmp_path / "store")
    ledger = OffsetsLedger(str(tmp_path), "near")
    sink = incremental_minhash_sink(out, ledger)
    _run(spark, near_stream_dir, out, sink)

    assert len(ledger.epochs()) == len(NEAR_EPOCHS)
    got = sorted(r["doc_id"] for r in minhash_keep_set(sink, spark).collect())
    want = sorted(
        r["doc_id"] for r in batch_minhash_keep_set(_near_corpus(spark)).collect()
    )
    assert got == want  # streaming rule == same rule over the whole corpus
    # sanity on the fixture: the near/exact dups actually collided
    assert 0 in got and 1 in got and 6 in got
    assert 2 not in got and 4 not in got and 5 not in got


def test_incremental_minhash_crash_restart(spark, near_stream_dir, tmp_path):
    from arroyo_spark.streaming.incremental import (
        batch_minhash_keep_set,
        epoch_minhash_transform,
        incremental_minhash_sink,
        minhash_keep_set,
    )

    out = str(tmp_path / "store")
    ledger = OffsetsLedger(str(tmp_path), "near")
    crash_sink = _CrashAfter(output_dir=out, ledger=ledger)
    crash_sink.crash_after = 1
    crash_sink.transform = epoch_minhash_transform(crash_sink)
    with pytest.raises(Exception, match="injected crash"):
        _run(spark, near_stream_dir, out, crash_sink)
    assert len(ledger.epochs()) == 1

    sink2 = incremental_minhash_sink(out, ledger)
    _run(spark, near_stream_dir, out, sink2)
    assert len(ledger.epochs()) == len(NEAR_EPOCHS)
    got = sorted(r["doc_id"] for r in minhash_keep_set(sink2, spark).collect())
    want = sorted(
        r["doc_id"] for r in batch_minhash_keep_set(_near_corpus(spark)).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Incremental ANN index (the similarity twin of the dedup compositions)
# ---------------------------------------------------------------------------
VEC_SCHEMA = "vec_id bigint, embedding array<double>"


def _vec_epochs():
    """3 epochs of dim-4 vectors: clusters (bucket collisions), one zero
    vector (excluded from cosine by contract), and one direction crowded
    enough to trip a query-time bucket cap."""
    import random

    rng = random.Random(7)
    base = [
        [1.0, 0.2, 0.1, 0.0],
        [-0.5, 1.0, 0.3, -0.2],
        [0.1, -0.3, 1.0, 0.4],
    ]
    rows, vid = [], 0
    for ep in range(3):
        epoch = []
        for b in base:
            for _ in range(4):  # 4 jittered members per direction per epoch
                epoch.append(
                    (vid, [x + rng.uniform(-0.05, 0.05) for x in b])
                )
                vid += 1
        if ep == 0:
            epoch.append((vid, [0.0, 0.0, 0.0, 0.0]))  # zero-norm
            vid += 1
        rows.append(epoch)
    return rows


@pytest.fixture()
def vec_stream_dir(spark, tmp_path):
    src = tmp_path / "vecs"
    src.mkdir()
    for i, rows in enumerate(_vec_epochs()):
        df = spark.createDataFrame(rows, VEC_SCHEMA)
        tmp = str(tmp_path / f"_v{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], str(src / f"{i:03d}.parquet"))
    return str(src)


def test_incremental_ann_equals_batch_lsh(spark, vec_stream_dir, tmp_path):
    """The committed store is a queryable sign-LSH index: querying it with
    the corpus reproduces batch lsh_ann_topk exactly — same hyperplanes,
    same query-time bucket cap, same zero-norm exclusion, same tie-break.
    compact_every=2 forces a compaction inside the 3-epoch run, so the
    equality also certifies compacted + tail index reads."""
    from arroyo_spark.operators.similarity import lsh_ann_topk
    from arroyo_spark.streaming.incremental import ann_query_topk, incremental_ann_sink

    out = str(tmp_path / "index")
    ledger = OffsetsLedger(str(tmp_path), "ann")
    sink = incremental_ann_sink(
        out, ledger, n_planes=3, dim=4, compact_every=2
    )
    proc = StreamProcessor(
        spark=spark,
        source=FileStreamSource(vec_stream_dir, VEC_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=f"{out}/ckpt",
    )
    proc.run_until_complete()
    assert len(ledger.epochs()) >= 3

    corpus = spark.createDataFrame(
        [r for ep in _vec_epochs() for r in ep], VEC_SCHEMA
    )
    kwargs = dict(k=3, n_planes=3, dim=4, max_bucket_size=6)
    got = ann_query_topk(sink, spark, corpus, **kwargs).collect()
    want = lsh_ann_topk(corpus, **kwargs).collect()

    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got_m = {key(r): (r["bucket"], r["neighbor_id"], r["cosine"]) for r in got}
    want_m = {key(r): (r["bucket"], r["neighbor_id"], r["cosine"]) for r in want}
    assert got_m == want_m and len(got) == len(want)
    # the zero vector appears in NO result (neither as query nor neighbor)
    zero_id = 12 * 1 + 0 + 12  # first row appended after epoch 0's 12
    assert all(
        r["query_id"] != zero_id and r["neighbor_id"] != zero_id for r in got
    )
    # cap is live: with an uncapped query the crowded buckets return more
    uncapped = ann_query_topk(
        sink, spark, corpus, k=3, n_planes=3, dim=4, max_bucket_size=None
    ).count()
    assert uncapped >= len(got)


# ---------------------------------------------------------------------------
# Incremental CONVERSATION-level dedup (whole-conversation epochs)
# ---------------------------------------------------------------------------
CONV_SCHEMA = "conv_id string, turn_idx int, role string, text string"

CONV_EPOCHS = [
    # epoch 0: two distinct convs + an in-epoch verbatim retry of c1
    [("c1", 0, "user", "hello there"), ("c1", 1, "assistant", "hi"),
     ("c1x", 0, "user", "Hello, THERE"), ("c1x", 1, "assistant", "hi!"),  # norm-dup of c1
     ("c2", 0, "user", "different"), ("c2", 1, "assistant", "reply")],
    # epoch 1: cross-epoch retry of c1 + a turn-SWAPPED variant (distinct)
    [("c1r", 0, "user", "hello there"), ("c1r", 1, "assistant", "hi"),
     ("c3", 0, "assistant", "hi"), ("c3", 1, "user", "hello there")],
    # epoch 2: retry of c2 + fresh conv
    [("c2r", 0, "user", "different"), ("c2r", 1, "assistant", "reply"),
     ("c4", 0, "user", "brand new")],
]
UNIQUE_CONVS = 4  # c1, c2, c3 (order-distinct), c4


@pytest.fixture()
def conv_stream_dir(spark, tmp_path):
    src = tmp_path / "convs"
    src.mkdir()
    for i, rows in enumerate(CONV_EPOCHS):
        df = spark.createDataFrame(rows, CONV_SCHEMA)
        tmp = str(tmp_path / f"_c{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], str(src / f"{i:03d}.parquet"))
    return str(src)


def _conv_run(spark, conv_stream_dir, out, sink):
    proc = StreamProcessor(
        spark=spark,
        source=FileStreamSource(conv_stream_dir, CONV_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=f"{out}/ckpt",
    )
    proc.run_until_complete()


def test_incremental_transcript_dedup_equals_batch(spark, conv_stream_dir, tmp_path):
    from arroyo_spark.operators.corpus import transcript_dedup
    from arroyo_spark.streaming.incremental import incremental_transcript_dedup_sink

    out = str(tmp_path / "tstore")
    ledger = OffsetsLedger(str(tmp_path), "tdedup")
    sink = incremental_transcript_dedup_sink(out, ledger, text_col="text")
    _conv_run(spark, conv_stream_dir, out, sink)
    assert len(ledger.epochs()) == len(CONV_EPOCHS)

    got = sink.read_output(spark)
    keepers = {r["conv_id"] for r in got.select("conv_id").distinct().collect()}
    # first arrival wins: c1 (not c1x/c1r), c2 (not c2r); c3 is order-
    # distinct from c1 and survives
    assert keepers == {"c1", "c2", "c3", "c4"}
    # committed rows are the keepers' full turn rows
    assert got.count() == sum(
        2 if c != "c4" else 1 for c in keepers
    )
    # fingerprint set equals batch transcript_dedup over the whole corpus
    corpus = spark.createDataFrame(
        [r for ep in CONV_EPOCHS for r in ep], CONV_SCHEMA
    )
    batch = transcript_dedup(corpus)
    assert batch.count() == UNIQUE_CONVS
    got_fps = {r["conv_fp"] for r in got.select("conv_fp").distinct().collect()}
    want = {(r["conv_fp"], r["keep_conv_id"]) for r in batch.collect()}
    assert got_fps == {fp for fp, _ in want}
    # and the keeper CHOICE matches batch's min-id rule (ids here are
    # monotone with arrival, the documented precondition)
    got_pairs = {
        (r["conv_fp"], r["conv_id"])
        for r in got.select("conv_fp", "conv_id").distinct().collect()
    }
    assert got_pairs == want


def test_incremental_transcript_dedup_crash_restart(spark, conv_stream_dir, tmp_path):
    from arroyo_spark.streaming.incremental import (
        epoch_transcript_dedup_transform,
        incremental_transcript_dedup_sink,
    )

    out = str(tmp_path / "tstore")
    ledger = OffsetsLedger(str(tmp_path), "tdedup")
    crash_sink = _CrashAfter(output_dir=out, ledger=ledger)
    crash_sink.crash_after = 1
    crash_sink.transform = epoch_transcript_dedup_transform(crash_sink)
    with pytest.raises(Exception, match="injected crash"):
        _conv_run(spark, conv_stream_dir, out, crash_sink)
    assert len(ledger.epochs()) == 1

    sink2 = incremental_transcript_dedup_sink(out, ledger)
    _conv_run(spark, conv_stream_dir, out, sink2)
    assert len(ledger.epochs()) == len(CONV_EPOCHS)
    keepers = {
        r["conv_id"]
        for r in sink2.read_output(spark).select("conv_id").distinct().collect()
    }
    assert keepers == {"c1", "c2", "c3", "c4"}


def test_incremental_transcript_dedup_first_arrival_beats_min_id(spark, tmp_path):
    """The streaming keep rule is first-ARRIVAL (epoch, then id), not
    global min-id: a duplicate arriving in a later epoch under a smaller
    conv_id must NOT displace the committed keeper. (This is the case
    where batch transcript_dedup's min-id keeper legitimately differs —
    the driver query's oracle ranks by (epoch, conv_id) for exactly this
    reason.)"""
    from arroyo_spark.streaming.incremental import incremental_transcript_dedup_sink

    out = str(tmp_path / "tstore")
    ledger = OffsetsLedger(str(tmp_path), "tdedup")
    sink = incremental_transcript_dedup_sink(out, ledger)
    # epoch 0: keeper with the LARGER id
    sink(
        spark.createDataFrame(
            [("z9", 0, "user", "hello"), ("z9", 1, "assistant", "hi")], CONV_SCHEMA
        ),
        0,
    )
    # epoch 1: fingerprint-identical conversation under a smaller id
    sink(
        spark.createDataFrame(
            [("a1", 0, "user", "hello"), ("a1", 1, "assistant", "hi")], CONV_SCHEMA
        ),
        1,
    )
    keepers = {
        r["conv_id"]
        for r in sink.read_output(spark).select("conv_id").distinct().collect()
    }
    assert keepers == {"z9"}
