"""topk_rollup/topk_merge + sampled_quantile_rollup/merge invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from arroyo_spark.operators.corpus import hash_bucket
from arroyo_spark.operators.sketch import (
    sampled_quantile_merge,
    sampled_quantile_rollup,
    topk_merge,
    topk_rollup,
)


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # 3 hourly buckets; item frequencies engineered per bucket:
    # item 1 dominant everywhere, items 2..6 mid, items 10..29 tail of 1s
    for h in range(3):
        freqs = {1: 20, 2: 8, 3: 7, 4: 6, 5: 5, 6: 4}
        for i in range(10, 30):
            freqs[i] = 1
        for item, n in freqs.items():
            for _ in range(n):
                rows.append((eid, t0 + dt.timedelta(hours=h, seconds=eid % 3000), item))
                eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp, item long"), {
        1: 60, 2: 24, 3: 21, 4: 18, 5: 15, 6: 12, **{i: 3 for i in range(10, 30)}
    }


def test_topk_bounds_and_presence_guarantee(spark):
    df, true = _events(spark)
    r = topk_rollup(df, "item", ts_col="ts", bucket="1 hour", m=4)
    merged = {row.item: (row.lb, row.ub) for row in topk_merge(r, "item").collect()}
    # per-bucket thresholds: rank-5 count in each bucket is 5 -> sum_thr = 15
    sum_thr = sum(
        row.thr for row in r.select("bucket_start", "thr").distinct().collect()
    )
    assert sum_thr == 15
    for item, (lb, ub) in merged.items():
        assert lb <= true[item] <= ub, (item, lb, true[item], ub)
    # presence guarantee: every item with true count > sum_thr surfaced
    for item, cnt in true.items():
        if cnt > sum_thr:
            assert item in merged, item
    # dominant item is kept in every bucket -> its bound is EXACT
    assert merged[1] == (60, 60)


def test_topk_exact_when_m_covers_cardinality(spark):
    df, true = _events(spark)
    r = topk_rollup(df, "item", ts_col="ts", bucket="1 hour", m=1000)
    merged = {row.item: (row.lb, row.ub) for row in topk_merge(r, "item").collect()}
    assert merged == {i: (c, c) for i, c in true.items()}


def test_sampled_quantile_merge_is_lossless(spark):
    df, _ = _events(spark)
    vals = df.withColumn("v", (F.col("event_id") % 997).cast("double"))
    r = sampled_quantile_rollup(vals, "event_id", "v", bucket="1 hour", fraction=0.3, salt="s")
    got = {row.q: row.est for row in sampled_quantile_merge(r, [0.25, 0.5, 0.9]).collect()}
    # direct computation on the hash-sampled raw rows (no bucketing at all)
    sampled = sorted(
        row.v
        for row in vals.filter(hash_bucket("event_id", salt="s") < 3000)
        .select("v")
        .collect()
    )
    n = len(sampled)
    want = {q: sampled[int(q * (n - 1))] for q in (0.25, 0.5, 0.9)}
    assert got == want
    # and bit-stable under repartitioning
    r2 = sampled_quantile_rollup(
        vals.repartition(13), "event_id", "v", bucket="1 hour", fraction=0.3, salt="s"
    )
    got2 = {row.q: row.est for row in sampled_quantile_merge(r2, [0.25, 0.5, 0.9]).collect()}
    assert got2 == got


def test_sampled_quantile_merge_empty_sample_returns_nulls(spark):
    # a rollup whose hash sample kept zero rows must surface NULL
    # estimates, not an element_at(.., 0) crash
    df, _ = _events(spark)
    vals = df.withColumn("v", (F.col("event_id") % 997).cast("double"))
    r = sampled_quantile_rollup(
        vals, "event_id", "v", bucket="1 hour", fraction=0.3, salt="s"
    ).filter(F.lit(False))  # simulate: no buckets survived
    got = {row.q: row.est for row in sampled_quantile_merge(r, [0.5, 0.9]).collect()}
    assert got == {0.5: None, 0.9: None}
