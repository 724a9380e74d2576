"""Incremental (streaming) deduplication — epoch-over-store composition.

The shape a 100 TB training-data pipeline actually consumes dedup in: each
micro-batch brings NEW documents, and a document is kept only if its
fingerprint has never been committed before. The accumulated fingerprint
store IS the sink's committed output — no side database:

  epoch N batch ──(fingerprint)──(first-wins within epoch)──
      ──(anti-join vs committed epochs < N)──> exactly-once epoch dir N

Exactly-once falls out of the existing ledger contract: a replayed epoch
re-reads the SAME committed store (its own uncommitted dir is not in the
ledger, so it never sees itself), recomputes the same keep-set, and
overwrites idempotently. Crash between data write and ledger commit ⇒ the
orphan dir is invisible to ``read_output`` and the replay regenerates it.

Scale notes (10^12 rows): the per-epoch work shuffles 64-bit fingerprints
(plus the epoch's own rows), never the historical documents — the store
anti-join reads ONLY the ``fingerprint`` column off the committed parquet
(column pruning). At very high epoch counts the store side should be
compacted into a bucketed-by-fingerprint table so the anti-join co-locates
without reshuffling history every epoch; the epoch-dir layout here is the
sandbox stand-in for that Iceberg-bucketed store.

Keep rule: FIRST ARRIVAL WINS — within an epoch the lowest ``id_col``
(deterministic under replay), across epochs the earliest committed epoch.
This is the only causally-consistent rule a stream can implement (a later
"better" duplicate cannot retract an already-committed keeper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arroyo_spark.operators.dedup import md5_hash64, normalize_text
from arroyo_spark.streaming.ledger import OffsetsLedger
from arroyo_spark.streaming.sink import ExactlyOnceSink


def epoch_dedup_transform(sink: ExactlyOnceSink, id_col: str = "doc_id", text_col: str = "text"):
    """Per-epoch transform: fingerprint -> first-wins within epoch ->
    anti-join against the sink's own committed history."""

    def transform(batch_df: DataFrame) -> DataFrame:
        spark = batch_df.sparkSession
        fp = md5_hash64(normalize_text(text_col)).alias("fingerprint")
        batch = batch_df.select(fp, *batch_df.columns)
        # within-epoch first-wins: min_by keeps the whole row with the
        # lowest id per fingerprint — a partial-aggregating groupBy (map-
        # side combine), not a count-over-window shuffle-and-sort
        cols = [c for c in batch.columns if c != "fingerprint"]
        epoch_keep = (
            batch.groupBy("fingerprint")
            .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_r"))
            .select("fingerprint", "_r.*")
        )
        try:
            store = sink.read_output(spark).select("fingerprint")
        except FileNotFoundError:
            return epoch_keep  # first epoch: nothing committed yet
        return epoch_keep.join(store, "fingerprint", "left_anti")

    return transform


def incremental_dedup_sink(
    output_dir: str,
    ledger: OffsetsLedger,
    id_col: str = "doc_id",
    text_col: str = "text",
    **sink_kwargs,
) -> ExactlyOnceSink:
    """ExactlyOnceSink whose committed output is the deduplicated corpus:
    every committed row is the first-ever arrival of its fingerprint."""
    sink = ExactlyOnceSink(output_dir=output_dir, ledger=ledger, **sink_kwargs)
    sink.transform = epoch_dedup_transform(sink, id_col, text_col)
    return sink
