"""Mergeable sketches — the 100 TB rollup pattern.

First-class training-data-pipeline addition (no reference counterpart —
the reference's Reduce flushes exact per-batch aggregates;
/root/reference/arroyo/processing/strategies/reduce.py). At 10^12 turns
you cannot keep exact per-key distinct sets, but you CAN keep a few-KB
sketch per coarse time bucket and merge sketches to answer any range:

  raw turns ──(hourly rollup)──> per-(hour, key) HLL sketch parquet
  query "distinct users for any day/week/month" = hll_union_agg over the
  covering hours — reads KBs of sketches instead of re-scanning TBs.

Everything is engine-native Apache DataSketches (Spark ≥3.5:
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) — JVM
aggregates with map-side partial merge, no Python in the hot path, and
the stored sketch column is a plain ``binary`` parquet column any other
Spark/DataSketches reader can consume.

``lgk`` trades size for accuracy: relative standard error ≈ 1.04/√(2^lgk)
(lgk=12 → ~1.6%). Sketch estimates are deterministic for fixed input but
NOT SQL-portable (DuckDB's HLL differs), so driver queries over these are
rows-only checks; accuracy is asserted against exact counts in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    lgk: int = 12,
) -> DataFrame:
    """Pre-aggregate one HLL sketch per (time bucket, *keys).

    The stored artifact for incremental rollup: each streaming epoch (or
    batch partition) contributes partial sketches; parquet-append them and
    later range queries merge with ``sketch_merge``. Output:
    (bucket_start, *keys, sketch binary, n_rows exact).
    """
    keys = keys or []
    return df.groupBy(
        F.window(ts_col, bucket).alias("_win"), *[F.col(k) for k in keys]
    ).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.col("_win.start").alias("bucket_start"),
        *[F.col(k) for k in keys],
        "sketch",
        "n_rows",
    )


def sketch_merge(
    rollup: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Merge per-bucket sketches (optionally re-keyed) into distinct-count
    estimates: union is lossless for HLL, so estimates over merged buckets
    equal a sketch built over the concatenated raw data."""
    keys = keys or []
    grouped = rollup.groupBy(*[F.col(k) for k in keys]) if keys else rollup.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


def approx_distinct(
    df: DataFrame, value_col: str, keys: list[str] | None = None, rsd: float = 0.016
) -> Column | DataFrame:
    """One-shot approximate distinct per key group (HLL++, map-side
    partials). The non-rollup form — use ``sketch_rollup`` when the
    sketches must be stored and re-merged later."""
    keys = keys or []
    agg = F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    return df.groupBy(*[F.col(k) for k in keys]).agg(agg) if keys else df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    keys: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Mergeable quantile estimates (Greenwald-Khanna) per key group —
    error ≤ 1/accuracy in rank. The percentile path that survives 10^12
    rows where exact percentile_cont would need a full sort."""
    keys = keys or []
    agg = F.percentile_approx(
        value_col, F.array(*[F.lit(q) for q in quantiles]), F.lit(accuracy)
    ).alias("approx_quantiles")
    return df.groupBy(*[F.col(k) for k in keys]).agg(agg) if keys else df.agg(agg)
