"""Incremental-store compaction (VERDICT r4 #2): the per-epoch store read
must touch O(1 + tail) dirs, not O(committed epochs).

Drives the sink directly (no streaming engine — epoch slicing is the
caller's here) for ~50 epochs and asserts:
(a) keep-set equality: compacted run == uncompacted run == batch exact_dedup
(b) crash mid-compaction recovers (no ledger record -> readers unaffected;
    re-running compact() overwrites), crash before prune leaves only
    ignored garbage that the next cycle sweeps
(c) the store read path is O(1 + tail) dirs and old epoch dirs are pruned
(d) a restarted sink (fresh ledger object) reads the compacted store
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from arroyo_spark.operators.dedup import exact_dedup
from arroyo_spark.streaming import OffsetsLedger
from arroyo_spark.streaming.incremental import (
    batch_minhash_keep_set,
    incremental_dedup_sink,
    incremental_minhash_sink,
    minhash_keep_set,
)

DOC_SCHEMA = "doc_id bigint, text string"
N_EPOCHS = 50
DOCS_PER_EPOCH = 3
N_TEXTS = 40  # < total docs -> guaranteed cross-epoch duplicates


def _epoch_rows(i: int) -> list[tuple[int, str]]:
    # ids monotone with arrival; text pool smaller than the corpus so
    # duplicates recur across epochs; 7 is coprime to 40 -> full coverage
    return [
        (i * DOCS_PER_EPOCH + k, f"text number {((i * DOCS_PER_EPOCH + k) * 7) % N_TEXTS}")
        for k in range(DOCS_PER_EPOCH)
    ]


def _corpus(spark):
    rows = [r for i in range(N_EPOCHS) for r in _epoch_rows(i)]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _drive(spark, sink, n_epochs=N_EPOCHS):
    for i in range(n_epochs):
        sink(spark.createDataFrame(_epoch_rows(i), DOC_SCHEMA), epoch_id=i)


def _keepers(sink, spark):
    return sorted(
        (r["fingerprint"], r["doc_id"])
        for r in sink.read_output(spark).select("fingerprint", "doc_id").collect()
    )


def test_compaction_keepset_equality_and_bounded_read(spark, tmp_path):
    # compacted run
    lc = OffsetsLedger(str(tmp_path), "c")
    sc_ = incremental_dedup_sink(str(tmp_path / "c"), lc, compact_every=8)
    _drive(spark, sc_)
    # uncompacted control
    lu = OffsetsLedger(str(tmp_path), "u")
    su = incremental_dedup_sink(str(tmp_path / "u"), lu, compact_every=None)
    _drive(spark, su)

    got_c, got_u = _keepers(sc_, spark), _keepers(su, spark)
    want = sorted(
        (r["fingerprint"], r["keep_id"])
        for r in exact_dedup(_corpus(spark), "doc_id", "text").collect()
    )
    assert got_c == got_u == want
    assert len(got_c) == N_TEXTS

    # (c) O(1 + tail): the read path is one compacted dir + <compact_every
    # tail dirs; the control reads every committed epoch dir
    paths_c, paths_u = sc_.output_paths(), su.output_paths()
    assert len(paths_c) <= 1 + 8
    assert len(paths_u) == N_EPOCHS
    assert any("/compact/" in p for p in paths_c)
    # covered epoch dirs were pruned from disk
    covered = lc.latest_compaction()["upto_epoch"]
    assert covered >= N_EPOCHS - 8 - 1
    for e in range(covered + 1):
        assert not os.path.exists(sc_.data_dir(e))


def test_crash_mid_compaction_is_invisible_then_recovers(spark, tmp_path):
    ledger = OffsetsLedger(str(tmp_path), "crash")
    sink = incremental_dedup_sink(str(tmp_path / "s"), ledger, compact_every=None)
    _drive(spark, sink, n_epochs=10)
    before = _keepers(sink, spark)

    # simulate a crash mid-compaction: partial compact dir, NO ledger record
    partial = sink.compact_dir(9)
    os.makedirs(partial, exist_ok=True)
    with open(f"{partial}/part-00000.parquet", "w") as f:
        f.write("garbage — not parquet")
    assert _keepers(sink, spark) == before  # readers never see it
    assert len(sink.output_paths()) == 10

    # recovery: compact() overwrites the partial dir, records, prunes
    upto = sink.compact(spark)
    assert upto == 9
    assert _keepers(sink, spark) == before
    assert sink.output_paths() == [sink.compact_dir(9)]

    # crash AFTER record, BEFORE prune (stranded previous compaction dir):
    # run more epochs, compact without pruning, then the next cycle sweeps
    for i in range(10, 14):
        sink(spark.createDataFrame(_epoch_rows(i), DOC_SCHEMA), epoch_id=i)
    sink.compact(spark, prune=False)
    assert os.path.exists(sink.compact_dir(9))  # stranded but ignored
    assert _keepers(sink, spark) == _keepers(sink, spark)
    for i in range(14, 16):
        sink(spark.createDataFrame(_epoch_rows(i), DOC_SCHEMA), epoch_id=i)
    sink.compact(spark)  # full cycle sweeps every superseded dir
    assert not os.path.exists(sink.compact_dir(9))
    assert not os.path.exists(sink.compact_dir(13))
    assert sink.output_paths() == [sink.compact_dir(15)]
    want = sorted(
        (r["fingerprint"], r["keep_id"])
        for r in exact_dedup(
            spark.createDataFrame(
                [r for i in range(16) for r in _epoch_rows(i)], DOC_SCHEMA
            ),
            "doc_id",
            "text",
        ).collect()
    )
    assert _keepers(sink, spark) == want


def test_restart_reads_compacted_store_and_continues(spark, tmp_path):
    ledger = OffsetsLedger(str(tmp_path), "restart")
    sink = incremental_dedup_sink(str(tmp_path / "s"), ledger, compact_every=4)
    _drive(spark, sink, n_epochs=12)

    # fresh objects — a restarted driver re-scans the ledger from disk
    ledger2 = OffsetsLedger(str(tmp_path), "restart")
    sink2 = incremental_dedup_sink(str(tmp_path / "s"), ledger2, compact_every=4)
    assert ledger2.latest_compaction() is not None
    for i in range(12, 20):
        sink2(spark.createDataFrame(_epoch_rows(i), DOC_SCHEMA), epoch_id=i)
    want = sorted(
        (r["fingerprint"], r["keep_id"])
        for r in exact_dedup(
            spark.createDataFrame(
                [r for i in range(20) for r in _epoch_rows(i)], DOC_SCHEMA
            ),
            "doc_id",
            "text",
        ).collect()
    )
    assert _keepers(sink2, spark) == want
    assert len(sink2.output_paths()) <= 1 + 4


def test_minhash_band_store_compaction(spark, tmp_path):
    texts = [
        f"document {j} with some shared words plus unique token zz{j % 9}"
        for j in range(12)
    ]

    def rows(i):
        return [(i * 2 + k, texts[(i * 2 + k) % 12]) for k in range(2)]

    ledger = OffsetsLedger(str(tmp_path), "mh")
    sink = incremental_minhash_sink(str(tmp_path / "mh"), ledger, compact_every=5)
    for i in range(15):
        sink(spark.createDataFrame(rows(i), DOC_SCHEMA), epoch_id=i)

    corpus = spark.createDataFrame(
        [r for i in range(15) for r in rows(i)], DOC_SCHEMA
    )
    got = sorted(r["doc_id"] for r in minhash_keep_set(sink, spark).collect())
    want = sorted(r["doc_id"] for r in batch_minhash_keep_set(corpus).collect())
    assert got == want
    assert len(sink.output_paths()) <= 1 + 5
