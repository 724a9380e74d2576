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

from arroyo_spark.streaming.commit import CommitPolicy
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
    commit_policy: "CommitPolicy | None" = None
    clock: Callable[[], float] = time.time
    # bounded retry for the driver-side write effects (data/DLQ parquet,
    # ledger commit) — all idempotent overwrites, so a transient FS error
    # retries instead of failing the epoch (see streaming/retries.py;
    # reference: arroyo/utils/retries.py)
    write_retry: "object | None" = None
    _dlq_state: DlqLimitState | None = field(default=None, repr=False)
    _policy_state: object = field(default=None, repr=False)
    n_policy_commits: int = field(default=0, repr=False)
    # synthetic message counter for lineage-less (pre-aggregated) batches:
    # without partition/offset columns next_offsets stays {} and a
    # min_commit_messages policy would see messages_since=0 forever; this
    # feeds the policy n_total per epoch on a synthetic partition -1
    _synthetic_next: int = field(default=0, repr=False)

    def __post_init__(self) -> None:
        if self.dlq_limit is not None:
            self._dlq_state = DlqLimitState(self.dlq_limit)
        if self.commit_policy is not None:
            self.set_commit_policy(self.commit_policy)

    def set_commit_policy(self, policy: "CommitPolicy") -> None:
        """Wire an offset-commit throttling policy (reference CommitPolicy,
        /root/reference/arroyo/commit.py:10-58). The ledger row is still
        written per epoch (exactly-once requires it); the policy gates the
        *offset flush* cadence — the observable should_commit/did_commit
        contract that the reference goldens assert."""
        self.commit_policy = policy
        self._policy_state = policy.get_state_machine(now=self.clock())

    # -- paths ---------------------------------------------------------
    def data_dir(self, epoch_id: int) -> str:
        return f"{self.output_dir}/data/epoch={epoch_id}"

    def _retry(self, fn):
        """Run a driver-side write through the retry policy (default: 3
        attempts, 0.2s apart — a transient FS error must not fail an epoch
        whose replay would succeed; every wrapped write is idempotent)."""
        if self.write_retry is None:
            from arroyo_spark.streaming.retries import RetryPolicy

            self.write_retry = RetryPolicy()
        return self.write_retry.call(fn)

    def dlq_dir(self, epoch_id: int) -> str:
        return f"{self.output_dir}/dlq/epoch={epoch_id}"

    def _write_schema_once(self, out: DataFrame) -> None:
        """Persist the output schema next to data/ on the first commit, so a
        downstream PipeTopic.source (or any reader) can build its stream
        without a driver-side batch-inference scan over every epoch dir —
        at 10^5 committed epochs that listing alone is minutes."""
        import os

        path = f"{self.output_dir}/schema.json"
        if not os.path.exists(path):
            tmp = f"{path}.tmp"
            with open(tmp, "w") as f:
                f.write(out.schema.json())
            os.replace(tmp, path)  # atomic, idempotent across replays

    # -- the foreachBatch callable --------------------------------------
    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.ledger.is_committed(epoch_id):
            return  # replay after restart: already fully committed
        t0 = time.time()
        batch_df = batch_df.persist()
        try:
            has_lineage = "partition" in batch_df.columns and "offset" in batch_df.columns

            # ONE action for count + per-partition next-offsets + max event
            # time: per-epoch driver actions are serial cost that caps
            # scaling efficiency — never spend two passes where one works
            next_offsets: dict[int, int] = {}
            max_ts = None
            if has_lineage:
                stats = (
                    batch_df.groupBy("partition")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        (F.max("offset") + 1).alias("no"),
                        F.max("ts").alias("mts"),
                    )
                    .collect()
                )
                n_total = sum(r["n"] for r in stats)
                for r in stats:
                    next_offsets[r["partition"]] = r["no"]
                    if r["mts"] is not None:
                        max_ts = max(max_ts, r["mts"]) if max_ts else r["mts"]
            else:
                # continuous mode (pre-aggregated batches): still record the
                # consumer-latency metric from any event-time column present
                ts_col = next((c for c in ("ts", "win_end", "win_start") if c in batch_df.columns), None)
                if ts_col is not None:
                    row = batch_df.agg(
                        F.count(F.lit(1)).alias("n"), F.max(ts_col).alias("mts")
                    ).collect()[0]
                    n_total, max_ts = row["n"], row["mts"]
                else:
                    n_total = batch_df.count()

            n_invalid = 0
            data_in = batch_df
            # mid-pipeline InvalidMessage capture (operators.map.run_task_safe
            # writes _invalid_reason; originals pass through untouched)
            from arroyo_spark.operators.map import INVALID_REASON_COL

            captured = INVALID_REASON_COL in batch_df.columns
            valid_cond = self.valid
            reason: Column | str = self.reason
            if captured:
                is_ok = F.col(INVALID_REASON_COL).isNull()
                valid_cond = is_ok if valid_cond is None else (valid_cond & is_ok)
                reason = F.coalesce(F.col(INVALID_REASON_COL), F.lit(self.reason))
            if valid_cond is not None:
                data_in, dlq_df = split_dlq(batch_df, valid_cond, reason, self.payload_col)
                dlq_df = dlq_df.persist()
                n_invalid = dlq_df.count()
                if self._dlq_state is not None:
                    runs = consecutive_invalid_runs(batch_df, valid_cond, self._dlq_state)
                    self._dlq_state.check_epoch(n_total, n_invalid, runs)  # raises -> epoch fails
                if n_invalid:
                    self._retry(
                        lambda: dlq_df.write.mode("overwrite").parquet(self.dlq_dir(epoch_id))
                    )
                dlq_df.unpersist()
            if captured:
                data_in = data_in.drop(INVALID_REASON_COL)

            out = self.transform(data_in) if self.transform is not None else data_in
            self._retry(lambda: out.write.mode("overwrite").parquet(self.data_dir(epoch_id)))
            self._write_schema_once(out)

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
            if self._policy_state is not None:
                now = self.clock()
                policy_offsets = next_offsets
                if not has_lineage:
                    # lineage-less stream: advance a synthetic partition by
                    # n_total so messages-based policies still see deltas
                    self._synthetic_next += n_total
                    policy_offsets = {-1: self._synthetic_next}
                if self._policy_state.should_commit(now, policy_offsets):
                    self._policy_state.did_commit(now, policy_offsets)
                    self.n_policy_commits += 1
                metrics["arroyo.consumer.commit.count"] = float(self.n_policy_commits)
            self._retry(lambda: self.ledger.commit(epoch_id, next_offsets, metrics))
        finally:
            batch_df.unpersist()

    # -- reading back ----------------------------------------------------
    def read_output(self, spark) -> DataFrame:
        """All committed output rows (uncommitted epoch dirs are excluded).

        Contract: valid under APPEND output mode only (the StreamProcessor
        default) — every group key is emitted exactly once across epochs.
        Update-mode aggregations re-emit live keys each epoch; unioning
        epoch dirs would then return stale duplicates.
        """
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
