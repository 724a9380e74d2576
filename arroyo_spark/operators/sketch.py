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


def topk_rollup(
    df: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    m: int = 20,
) -> DataFrame:
    """Mergeable heavy-hitters rollup with PROVABLE bounds — the frequent-
    items companion to ``sketch_rollup``, and unlike HLL it is pure
    relational algebra (exact integer counts), so it is hash-exact
    oracle-checkable.

    Per time bucket: exact item counts (one partial-agg'd groupBy), keep
    the top ``m`` (count DESC, item ASC ties), and record the bucket's
    threshold ``thr`` = the (m+1)-th count (0 if the bucket has <= m
    items). Every dropped item's in-bucket count is <= thr by
    construction — that inequality is what makes the summaries mergeable
    with bounds. Output: (bucket_start, item, cnt, thr) — O(m) rows per
    bucket regardless of item cardinality.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(
        F.window(ts_col, bucket).alias("_win"), F.col(item_col)
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("_win").orderBy(F.col("cnt").desc(), F.col(item_col))
    ranked = counts.withColumn("_rk", F.row_number().over(w))
    thr = ranked.filter(F.col("_rk") == m + 1).select(
        "_win", F.col("cnt").alias("thr")
    )
    return (
        ranked.filter(F.col("_rk") <= m)
        .join(F.broadcast(thr), "_win", "left")
        .select(
            F.col("_win.start").alias("bucket_start"),
            item_col,
            "cnt",
            F.coalesce(F.col("thr"), F.lit(0)).cast("long").alias("thr"),
        )
    )


def topk_merge(rollup: DataFrame, item_col: str) -> DataFrame:
    """Merge ``topk_rollup`` summaries over any bucket range into
    per-item count BOUNDS:

      lb = sum of the item's kept counts (it may be under-counted only in
           buckets that dropped it);
      ub = lb + sum(thr of buckets where the item was NOT kept)
         = lb + (all buckets' thr) - (thr of buckets where it was kept).

    Guarantee: lb <= true count <= ub, and any item whose true total
    exceeds sum(all thr) is PRESENT in the output (it must have made some
    bucket's top-m). With m >= per-bucket cardinality every thr is 0 and
    lb = ub = exact. The merge shuffles only (item, counts) pairs; the
    scalar total joins back as a broadcast of one row.
    """
    per_bucket_thr = rollup.groupBy("bucket_start").agg(F.max("thr").alias("_t"))
    total = per_bucket_thr.agg(F.sum("_t").alias("_all_thr"))
    per_item = rollup.groupBy(item_col).agg(
        F.sum("cnt").alias("lb"), F.sum("thr").alias("_present_thr")
    )
    return per_item.join(F.broadcast(total)).select(
        item_col,
        F.col("lb").cast("long").alias("lb"),
        (F.col("lb") + F.col("_all_thr") - F.col("_present_thr"))
        .cast("long")
        .alias("ub"),
    )


def sampled_quantile_rollup(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    fraction: float = 0.25,
    salt: str = "",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Deterministic sampled quantile rollup: per time bucket, store the
    SORTED value array of a hash-sampled subset of rows.

    The merge-losslessness is free by construction: a hash sample commutes
    with any partitioning (a row's survival depends only on its key), so
    the union of per-bucket samples IS the sample of the union — merging
    rollups loses nothing relative to sampling the raw range directly,
    and the whole path is bit-reproducible (no reservoir/rand()). Storage
    per bucket is O(fraction * rows); tune fraction per retention tier.
    """
    from arroyo_spark.operators.corpus import hash_bucket

    thr = int(round(fraction * n_buckets))
    return (
        df.filter(hash_bucket(key_col, n_buckets, salt) < thr)
        .groupBy(F.window(ts_col, bucket).alias("_win"))
        .agg(
            F.array_sort(F.collect_list(F.col(value_col).cast("double"))).alias("vals"),
            F.count(F.lit(1)).alias("n_sampled"),
        )
        .select(F.col("_win.start").alias("bucket_start"), "vals", "n_sampled")
    )


def sampled_quantile_merge(rollup: DataFrame, quantiles: list[float]) -> DataFrame:
    """Merge sampled rollups over any bucket range and read off quantiles
    (lower-index method: est = sorted[floor(q * (n - 1))], 0-based) —
    deterministic, and equal to computing directly on the hash-sampled
    raw rows, which is exactly what the oracle twin does."""
    merged = rollup.agg(F.array_sort(F.flatten(F.collect_list("vals"))).alias("_all"))
    picks = [
        F.struct(
            F.lit(q).alias("q"),
            # empty merged sample: the index expression degenerates to 0
            # (element_at rejects it) -> surface NULL estimates instead
            F.when(
                F.size("_all") > 0,
                F.element_at(
                    "_all",
                    (F.floor(F.lit(q) * (F.size("_all") - 1)) + 1).cast("int"),
                ),
            ).alias("est"),
        )
        for q in quantiles
    ]
    return merged.select(F.explode(F.array(*picks)).alias("_r")).select(
        "_r.q", "_r.est"
    )
