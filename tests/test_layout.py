"""Range-clustered layout: row-group pruning measured, not asserted by vibes.

The claim under test: ``write_clustered`` produces a table where a
selective predicate on the cluster key admits only a small fraction of
row groups by min/max stats, while the same data written in its natural
(hash-mixed) order admits ~all of them — and both layouts return the
identical row set through Spark with the filter pushed to the scan.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from arroyo_spark.sources import rowgroup_admit_stats, write_clustered
from arroyo_spark.synth import transcripts


@pytest.fixture(scope="module")
def layout_dirs(spark):
    base = tempfile.mkdtemp(prefix="layout_")
    df = transcripts(spark, 600, with_lineage=False).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    # natural = key-mixed placement: what persisting the output of any
    # hash-partitioned stage (or interleaved multi-tenant arrival) gives
    # you — every file sees conv_ids from across the key range, so conv_id
    # min/max stats span (nearly) everything in every row group. (synth's
    # ts is conv_seq-correlated at small n, so time order would accidentally
    # BE conv order here; a deterministic hash order models the mixed case.)
    df.orderBy(F.xxhash64("conv_id", "turn_idx")).write.mode("overwrite").option(
        "maxRecordsPerFile", 400
    ).parquet(f"{base}/natural")
    write_clustered(
        df, f"{base}/clustered", ["conv_id"], n_files=8, max_records_per_file=400
    )
    yield base, df
    shutil.rmtree(base, ignore_errors=True)


def _median_key(df) -> str:
    """A mid-range conv_id: equality on it is the worst case for a
    hash-mixed layout (every file's [min, max] straddles it) and the best
    case for a clustered one (exactly one file range covers it)."""
    keys = [r["conv_id"] for r in df.select("conv_id").distinct().orderBy("conv_id").collect()]
    return keys[len(keys) // 2]


def test_clustered_rowgroups_prune_natural_do_not(layout_dirs, spark):
    base, df = layout_dirs
    # a one-conversation point lookup — the 10^12-turn table's bread and
    # butter. Bounds chosen as an equality interval [key, key].
    key = _median_key(df)
    nat = rowgroup_admit_stats(f"{base}/natural", "conv_id", key, key)
    clu = rowgroup_admit_stats(f"{base}/clustered", "conv_id", key, key)
    assert nat["rowgroups"] >= 8 and clu["rowgroups"] >= 8
    # hash-mixed layout: the key appears in (nearly) every row group
    assert nat["admit_frac"] > 0.5, nat
    # clustered layout: the key lives in O(1) row groups
    assert clu["admitting"] <= 2, clu
    assert clu["admit_frac"] < 0.2, clu
    # the audit's admitted_rows bound the actual decode cost
    assert clu["admitted_rows"] < nat["admitted_rows"] / 3


def test_both_layouts_answer_identically_with_pushdown(layout_dirs, spark):
    base, df = layout_dirs
    key = _median_key(df)
    reads = {}
    for name in ("natural", "clustered"):
        scan = spark.read.parquet(f"{base}/{name}").filter(F.col("conv_id") == key)
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "conv_id" in plan
        reads[name] = sorted(
            (r["conv_id"], r["turn_idx"], r["text"]) for r in scan.collect()
        )
    assert reads["natural"] == reads["clustered"]
    assert len(reads["natural"]) > 0


def test_zorder_prunes_on_both_dimensions(layout_dirs, spark):
    """One Z-ordered layout serves BOTH predicate shapes: conv_id equality
    (the point lookup) and ts range (the backfill). Single-column
    clustering by conv_id serves only the first — its ts stats stay wide.
    Uses an independent uniform ts so neither dimension is a proxy for the
    other (synth's conv_start correlates with conv_seq)."""
    import datetime

    from arroyo_spark.sources.layout import write_zordered

    base, df = layout_dirs
    d = df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(86400))),
    )
    write_zordered(d, f"{base}/zorder", ["conv_id", "ts"], n_files=8,
                   bits_per_col=8, max_records_per_file=400)
    write_clustered(d, f"{base}/conv_only", ["conv_id"], n_files=8,
                    max_records_per_file=400)

    key = _median_key(df)
    lo = datetime.datetime(2024, 1, 1, 6, 0, 0)
    hi = datetime.datetime(2024, 1, 1, 7, 0, 0)  # 1/24 of the ts domain

    z_conv = rowgroup_admit_stats(f"{base}/zorder", "conv_id", key, key)
    z_ts = rowgroup_admit_stats(f"{base}/zorder", "ts", lo, hi)
    c_conv = rowgroup_admit_stats(f"{base}/conv_only", "conv_id", key, key)
    c_ts = rowgroup_admit_stats(f"{base}/conv_only", "ts", lo, hi)

    # conv-only clustering: perfect on conv, useless on ts
    assert c_conv["admit_frac"] < 0.2, c_conv
    assert c_ts["admit_frac"] > 0.9, c_ts
    # z-order: materially prunes BOTH (each ~sqrt of a dedicated sort's
    # pruning — the Z-order bargain)
    assert z_conv["admit_frac"] < 0.6, z_conv
    assert z_ts["admit_frac"] < 0.6, z_ts
    assert z_conv["admit_frac"] < c_ts["admit_frac"]
    # row sets identical through Spark on both layouts
    a = spark.read.parquet(f"{base}/zorder").filter(F.col("conv_id") == key)
    b = spark.read.parquet(f"{base}/conv_only").filter(F.col("conv_id") == key)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_zorder_key_rejects_reserved_column_clash(layout_dirs, spark):
    """A pre-existing _zkey/_zb* column must raise, not silently vanish
    through the clobber-then-drop write path."""
    from arroyo_spark.sources import zorder_key

    _, df = layout_dirs
    with pytest.raises(ValueError, match="_zkey"):
        zorder_key(df.withColumn("_zkey", F.lit(1)), ["conv_id", "ts"])


def test_range_clustering_is_skew_aware(layout_dirs, spark):
    """repartitionByRange samples quantiles: the hot conversation (synth
    makes ~1/1000 convs 2000-turn hot) cannot stuff every file — file key
    ranges stay non-overlapping and all files materialize."""
    base, _ = layout_dirs
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(f"{base}/clustered/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index("conv_id")
        mins, maxs = [], []
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            assert st is not None and st.has_min_max, f"{f} rg{g}: no conv_id stats"
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) >= 4
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # non-overlapping file ranges
