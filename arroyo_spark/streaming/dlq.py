"""Dead-letter-queue subsystem.

Reference semantics reproduced (/root/reference/arroyo/dlq.py):
- invalid rows are routed to a DLQ table carrying original_partition /
  original_offset / reason (KafkaDlqProducer headers, dlq.py:228-253)
- DLQ writes happen BEFORE the offset commit of the epoch (dlq.py:423-436)
- DlqLimit(max_invalid_ratio, max_consecutive_count) fail-stops the
  pipeline rather than DLQ-ing 100% of traffic (dlq.py:80-182)
- invalid offsets are still committed so the stream advances
  (InvalidMessageState.build(), dlq.py:439-486) — free in our model since
  epochs commit source ranges.

Spark mapping: a declarative split of each micro-batch. The consecutive-
run check is a per-partition gaps-and-islands aggregation (offset -
row_number over invalid rows groups consecutive offsets), carried across
epochs by remembering each partition's trailing run.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DlqLimitExceeded(Exception):
    """Epoch failed its DLQ limit check — the stream must stop (fail-stop)."""


@dataclass(frozen=True)
class DlqLimit:
    """Mirror of arroyo DlqLimit (/root/reference/arroyo/dlq.py:80-96)."""

    max_invalid_ratio: float | None = None
    max_consecutive_count: int | None = None


@dataclass
class DlqLimitState:
    """Cross-epoch state for the consecutive-invalid check.

    ``tail_runs[p]`` = length of the invalid run at the END of the last
    epoch for partition p (continues into the next epoch if its first
    offsets are also invalid).
    """

    limit: DlqLimit
    tail_runs: dict[int, int] = field(default_factory=dict)

    def check_epoch(
        self,
        n_total: int,
        n_invalid: int,
        runs: list[tuple[int, int, bool]],
    ) -> None:
        """runs: per-partition (max_inner_run, leading_run, ends_invalid-run-len>0)
        encoded as (partition, max_run_including_carry, trailing_run)."""
        if self.limit.max_invalid_ratio is not None and n_total > 0:
            if n_invalid / n_total > self.limit.max_invalid_ratio:
                raise DlqLimitExceeded(
                    f"invalid ratio {n_invalid}/{n_total} exceeds "
                    f"{self.limit.max_invalid_ratio}"
                )
        if self.limit.max_consecutive_count is not None:
            for partition, max_run, trailing in runs:
                if max_run > self.limit.max_consecutive_count:
                    raise DlqLimitExceeded(
                        f"partition {partition}: {max_run} consecutive invalid "
                        f"messages exceed {self.limit.max_consecutive_count}"
                    )
                self.tail_runs[partition] = trailing


def split_dlq(
    df: DataFrame,
    valid: Column,
    reason: Column | str = "invalid",
    payload_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (valid_rows, dlq_rows).

    dlq rows carry (original_partition, original_offset, reason, payload, ts)
    — the DLQ_SCHEMA. Requires lineage columns (partition, offset).
    """
    reason_col = F.lit(reason) if isinstance(reason, str) else reason
    valid_df = df.filter(valid)
    dlq_df = df.filter(~valid).select(
        F.col("partition").alias("original_partition"),
        F.col("offset").alias("original_offset"),
        reason_col.alias("reason"),
        F.col(payload_col).cast("string").alias("payload"),
        F.col("ts"),
    )
    return valid_df, dlq_df


def consecutive_invalid_runs(
    df: DataFrame, valid: Column, state: DlqLimitState
) -> list[tuple[int, int, bool]]:
    """Per-partition longest consecutive-invalid-offset run (incl. carry-in).

    Gaps-and-islands on the invalid subset: consecutive offsets share
    (offset - row_number) within a partition. Leading runs (starting at the
    epoch's min offset) are extended by the previous epoch's trailing run.
    """
    from pyspark.sql import Window as W

    bounds = {
        r["partition"]: (r["lo"], r["hi"])
        for r in df.groupBy("partition")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"))
        .collect()
    }
    inv = df.filter(~valid).select("partition", "offset")
    w = W.partitionBy("partition").orderBy("offset")
    grouped = inv.withColumn("grp", F.col("offset") - F.row_number().over(w))
    runs = (
        grouped.groupBy("partition", "grp")
        .agg(F.count("*").alias("run"), F.min("offset").alias("start"), F.max("offset").alias("end"))
        .collect()
    )
    out: dict[int, tuple[int, int]] = {}
    for r in runs:
        lo, hi = bounds[r["partition"]]
        carry = state.tail_runs.get(r["partition"], 0) if r["start"] == lo else 0
        total = r["run"] + carry
        # a run touching the epoch's end continues into the next epoch;
        # if it also spans the whole epoch, the carry-in continues with it
        trailing = total if r["end"] == hi else 0
        prev_max, prev_trail = out.get(r["partition"], (0, 0))
        out[r["partition"]] = (max(prev_max, total), max(prev_trail, trailing))
    # partitions with no invalid rows reset their trailing run
    result = []
    for p in bounds:
        max_run, trailing = out.get(p, (0, 0))
        result.append((p, max_run, trailing))
    return result
