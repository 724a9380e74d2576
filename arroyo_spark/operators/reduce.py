"""Aggregation operators — Reduce / Buffer / BatchStep.

Reference semantics: Reduce folds ``accumulator`` over messages until
``max_batch_size`` messages or ``max_batch_time`` seconds, then emits one
``Value(result, merged_offsets, last_ts)``
(/root/reference/arroyo/processing/strategies/reduce.py:15-122). BatchStep
is Reduce with accumulator=append, emitting a ValuesBatch whose committable
is the max observed offset+1 per partition
(/root/reference/arroyo/processing/strategies/batching.py:13-96). Buffer
generalizes flush readiness to any predicate
(/root/reference/arroyo/processing/strategies/buffer.py:66-191).

Spark mapping (SURVEY.md §2.2 #5-7):
- time-bounded flush  -> event-time windows + watermark (tumbling/sliding/
  session); works identically in batch and streaming plans.
- count-bounded flush -> ``count_reduce`` (dense per-partition sequence //
  batch size — the exact golden of tests/processing/strategies/test_reduce.py:24-43).
- generic fold        -> ``fold_groups`` via applyInPandas (Arrow-batched
  UDAF) when the fold isn't expressible with built-in aggregates.

Every emitted group carries ``committable = max(offset)+1`` per source
partition when lineage columns are present — the reference's next-offset
contract (/root/reference/arroyo/backends/abstract.py:22-27).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd


def reduce_window(
    df: DataFrame,
    duration: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
    with_committable: bool = False,
) -> DataFrame:
    """Tumbling-window Reduce keyed by ``keys`` (default conv_id).

    Streaming-safe: pass ``watermark`` (e.g. "10 minutes") on a streaming df.
    """
    keys = keys if keys is not None else ["conv_id"]
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    agg_cols = [c.alias(name) for name, c in aggs.items()]
    if with_committable and "partition" in df.columns and "offset" in df.columns:
        agg_cols.append(F.max("offset").alias("_max_offset"))
        keys = keys + ["partition"]
    out = df.groupBy(F.window(ts_col, duration).alias("win"), *keys).agg(*agg_cols)
    if with_committable and "_max_offset" in out.columns:
        out = out.withColumn("next_offset", F.col("_max_offset") + 1).drop("_max_offset")
    return out


def sliding_window(
    df: DataFrame,
    duration: str,
    slide: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    keys = keys if keys is not None else ["conv_id"]
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    agg_cols = [c.alias(name) for name, c in aggs.items()]
    return df.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys).agg(*agg_cols)


def session_window_stream(
    df: DataFrame,
    gap: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows for streaming plans (native session_window + watermark)."""
    keys = keys if keys is not None else ["conv_id"]
    agg_cols = [c.alias(name) for name, c in aggs.items()]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(*agg_cols)
    )


def session_reduce_batch(
    df: DataFrame,
    gap_seconds: int,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization via gaps-and-islands (lag + cumulative sum).

    Oracle-mirrorable in ANSI SQL; produces one row per (key, session_id)
    with session bounds. One shuffle on ``keys`` shared by the window and
    the final groupBy (Catalyst reuses the hash partitioning).
    """
    from pyspark.sql import Window as W

    keys = keys if keys is not None else ["conv_id"]
    w = W.partitionBy(*keys).orderBy(ts_col)
    # double-cast: TIMESTAMP_NTZ (parquet default) can't go straight to long
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    with_sess = df.withColumn(
        "session_id", F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    agg_cols = [c.alias(name) for name, c in aggs.items()] + [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    return with_sess.groupBy(*keys, "session_id").agg(*agg_cols)


def count_reduce(
    df: DataFrame,
    max_batch_size: int,
    aggs: dict[str, Column],
    order_cols: list[str] | None = None,
    weight: Column | None = None,
) -> DataFrame:
    """Count/weight-bounded Reduce: per-partition batches in offset order.

    The golden contract of test_reduce.py:9-43 — payloads 0..5, size 3 ->
    batches {0,1,2}/{3,4,5} with committables {p:3}/{p:6}. Emits
    (partition, batch_id, <aggs>, next_offset=max(offset)+1).

    ``weight`` generalizes to arroyo's compute_batch_size
    (/root/reference/arroyo/processing/strategies/reduce.py:44-49, weighted
    golden tests/processing/strategies/test_batching.py:198-243): a message
    joins the current batch, and the batch flushes once its accumulated
    weight reaches max_batch_size (accumulator resets to 0 — overshoot does
    NOT carry). That reset makes the assignment inherently sequential, so
    the weighted path computes batch ids with an Arrow-batched per-partition
    scan; the unweighted path stays a pure window expression.

    Per-source-partition sequential semantics either way: one ordered pass
    per partition (P parallel tasks) — not a shuffle bottleneck at scale
    since P ~ number of source partitions.
    """
    from pyspark.sql import Window as W

    order_cols = order_cols or ["offset"]
    agg_cols = [c.alias(name) for name, c in aggs.items()] + [
        (F.max("offset") + 1).alias("next_offset")
    ]
    if weight is None:
        w = W.partitionBy("partition").orderBy(*order_cols)
        seq = F.row_number().over(w) - 1
        batched = df.withColumn("batch_id", (seq / max_batch_size).cast("long"))
        return batched.groupBy("partition", "batch_id").agg(*agg_cols)

    from pyspark.sql import types as T

    src = df.withColumn("_w", weight)
    out_schema = T.StructType(list(src.schema.fields) + [T.StructField("batch_id", T.LongType())])

    def assign(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        ids, bid, acc = [], 0, 0.0
        for wv in pdf["_w"]:
            ids.append(bid)
            acc += wv
            if acc >= max_batch_size:  # flush AFTER append; reset accumulator
                bid += 1
                acc = 0.0
        pdf["batch_id"] = ids
        return pdf

    batched = src.groupBy("partition").applyInPandas(assign, schema=out_schema)
    return batched.groupBy("partition", "batch_id").agg(*agg_cols)


def batch_step(
    df: DataFrame,
    duration: str,
    keys: list[str] | None = None,
    payload_cols: list[str] | None = None,
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """BatchStep: collect ordered per-window batches (array<struct>).

    Batch order is made deterministic by sorting on ``order_col`` inside the
    collected array (sort_array on a struct whose first field is the order
    key) — reproducing per-partition arrival order without a global sort.
    """
    keys = keys if keys is not None else ["conv_id"]
    payload_cols = payload_cols or [c for c in df.columns if c not in keys]
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    elem = F.struct(F.col(order_col), *[F.col(c) for c in payload_cols if c != order_col])
    return df.groupBy(F.window(ts_col, duration).alias("win"), *keys).agg(
        F.sort_array(F.collect_list(elem)).alias("batch"),
        F.count(F.lit(1)).alias("batch_size"),
    )


def fold_groups(
    df: DataFrame,
    keys: list[str],
    fold: Callable[["pd.DataFrame"], "pd.DataFrame"],
    schema: str,
) -> DataFrame:
    """Generic fold (Buffer with arbitrary accumulator) via applyInPandas.

    Use only when built-in aggregates can't express the fold — Arrow-batched
    per group, one shuffle on ``keys``.
    """
    return df.groupBy(*keys).applyInPandas(fold, schema=schema)
