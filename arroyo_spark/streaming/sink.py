"""Exactly-once foreachBatch sink (Produce + CommitOffsets fused).

Per epoch, in this order (the reference's delivery-before-commit ordering,
/root/reference/arroyo/processing/processor.py:330-337):
  1. skip the whole epoch if the ledger already has it (idempotent replay)
  2. split DLQ rows, check DLQ limits (fail-stop BEFORE anything is written)
  3. write DLQ rows (dlq writes precede offset commit, arroyo/dlq.py:423-436)
  4. apply the per-epoch transform, write result data
  5. atomically commit the epoch to the offsets ledger with per-partition
     next-offsets + lineage metrics

Metric names mirror the reference's vocabulary
(/root/reference/arroyo/utils/metric_defs.py): arroyo.consumer.latency,
arroyo.consumer.run.count, arroyo.consumer.invalid_message.count,
arroyo.consumer.processing.time.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arroyo_spark.streaming.dlq import (
    DlqLimit,
    DlqLimitState,
    consecutive_invalid_runs,
    split_dlq,
)
from arroyo_spark.streaming.ledger import OffsetsLedger


@dataclass
class ExactlyOnceSink:
    output_dir: str
    ledger: OffsetsLedger
    transform: Callable[[DataFrame], DataFrame] | None = None
    valid: Column | None = None
    dlq_limit: DlqLimit | None = None
    reason: str = "invalid"
    payload_col: str = "text"
    _dlq_state: DlqLimitState | None = field(default=None, repr=False)

    def __post_init__(self) -> None:
        if self.dlq_limit is not None:
            self._dlq_state = DlqLimitState(self.dlq_limit)

    # -- paths ---------------------------------------------------------
    def data_dir(self, epoch_id: int) -> str:
        return f"{self.output_dir}/data/epoch={epoch_id}"

    def dlq_dir(self, epoch_id: int) -> str:
        return f"{self.output_dir}/dlq/epoch={epoch_id}"

    # -- the foreachBatch callable --------------------------------------
    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.ledger.is_committed(epoch_id):
            return  # replay after restart: already fully committed
        t0 = time.time()
        batch_df = batch_df.persist()
        try:
            has_lineage = "partition" in batch_df.columns and "offset" in batch_df.columns
            n_total = batch_df.count()

            next_offsets: dict[int, int] = {}
            max_ts = None
            if has_lineage:
                stats = (
                    batch_df.groupBy("partition")
                    .agg((F.max("offset") + 1).alias("no"), F.max("ts").alias("mts"))
                    .collect()
                )
                for r in stats:
                    next_offsets[r["partition"]] = r["no"]
                    if r["mts"] is not None:
                        max_ts = max(max_ts, r["mts"]) if max_ts else r["mts"]
            else:
                # continuous mode (pre-aggregated batches): still record the
                # consumer-latency metric from any event-time column present
                ts_col = next((c for c in ("ts", "win_end", "win_start") if c in batch_df.columns), None)
                if ts_col is not None and n_total:
                    max_ts = batch_df.agg(F.max(ts_col)).collect()[0][0]

            n_invalid = 0
            data_in = batch_df
            if self.valid is not None:
                data_in, dlq_df = split_dlq(batch_df, self.valid, self.reason, self.payload_col)
                dlq_df = dlq_df.persist()
                n_invalid = dlq_df.count()
                if self._dlq_state is not None:
                    runs = consecutive_invalid_runs(batch_df, self.valid, self._dlq_state)
                    self._dlq_state.check_epoch(n_total, n_invalid, runs)  # raises -> epoch fails
                if n_invalid:
                    dlq_df.write.mode("overwrite").parquet(self.dlq_dir(epoch_id))
                dlq_df.unpersist()

            out = self.transform(data_in) if self.transform is not None else data_in
            out.write.mode("overwrite").parquet(self.data_dir(epoch_id))

            metrics = {
                "arroyo.consumer.run.count": float(n_total),
                "arroyo.consumer.invalid_message.count": float(n_invalid),
                "arroyo.consumer.processing.time": time.time() - t0,
            }
            if max_ts is not None:
                import calendar

                metrics["arroyo.consumer.latency"] = time.time() - calendar.timegm(
                    max_ts.timetuple()
                )
            self.ledger.commit(epoch_id, next_offsets, metrics)
        finally:
            batch_df.unpersist()

    # -- reading back ----------------------------------------------------
    def read_output(self, spark) -> DataFrame:
        """All committed output rows (uncommitted epoch dirs are excluded)."""
        import os

        dirs = [self.data_dir(e) for e in self.ledger.epochs()]
        dirs = [d for d in dirs if os.path.exists(d)]
        if not dirs:
            raise FileNotFoundError(f"no committed epochs under {self.output_dir}")
        return spark.read.option("basePath", f"{self.output_dir}/data").parquet(*dirs)

    def read_dlq(self, spark) -> DataFrame:
        import os

        dirs = [self.dlq_dir(e) for e in self.ledger.epochs() if os.path.exists(self.dlq_dir(e))]
        if not dirs:
            from arroyo_spark.types import DLQ_SCHEMA

            return spark.createDataFrame([], DLQ_SCHEMA)
        return spark.read.option("basePath", f"{self.output_dir}/dlq").parquet(*dirs)
