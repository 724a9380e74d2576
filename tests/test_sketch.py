"""Mergeable-sketch rollup tests: accuracy vs exact, merge losslessness."""

from __future__ import annotations

from pyspark.sql import functions as F

from arroyo_spark.operators.sketch import (
    approx_distinct,
    approx_quantiles,
    sketch_merge,
    sketch_rollup,
)


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_sketch_rollup_merge_matches_exact_within_error(spark):
    """Per-hour HLL sketches merged over the full range must estimate the
    global distinct count within HLL error (~1.6% at lgk=12) — the rollup
    answers any time range without rescanning raw data."""
    e = _events(spark)
    exact = e.select("user_id").distinct().count()

    rollup = sketch_rollup(e, "user_id", ts_col="ts", bucket="1 hour", lgk=12)
    assert rollup.columns == ["bucket_start", "sketch", "n_rows"]
    assert rollup.count() > 1, "fixture must span multiple buckets to test merging"

    est = sketch_merge(rollup).collect()[0]
    assert est["n_rows"] == e.count()
    assert abs(est["approx_distinct"] - exact) / exact < 0.05, (est["approx_distinct"], exact)


def test_sketch_rollup_keyed_and_rekeyed(spark):
    """Keyed rollup (hour, event_type) re-merged to per-event_type totals:
    each key's estimate tracks its exact distinct count."""
    e = _events(spark)
    rollup = sketch_rollup(e, "user_id", keys=["event_type"], bucket="1 hour")
    merged = {r["event_type"]: r["approx_distinct"] for r in sketch_merge(rollup, keys=["event_type"]).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(merged) == set(exact)
    for k, ex in exact.items():
        assert abs(merged[k] - ex) / ex < 0.05, (k, merged[k], ex)


def test_merge_is_lossless_vs_single_sketch(spark):
    """HLL union is lossless: merging hourly sketches gives the SAME
    estimate as one sketch over all raw rows (not just 'close')."""
    e = _events(spark)
    merged = sketch_merge(sketch_rollup(e, "user_id", bucket="1 hour")).collect()[0][
        "approx_distinct"
    ]
    single = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("d")
    ).collect()[0]["d"]
    assert merged == single


def test_approx_distinct_and_quantiles(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = d.select("source").distinct().count()
    approx = approx_distinct(d, "source").collect()[0]["approx_distinct"]
    assert abs(approx - exact) <= max(1, 0.05 * exact)

    qs = approx_quantiles(d, "n_chars", [0.5, 0.9]).collect()[0]["approx_quantiles"]
    p50, p90 = d.approxQuantile("n_chars", [0.5, 0.9], 0.0)  # exact (relError=0)
    assert qs[0] <= qs[1]
    # GK with accuracy=10000 on a 500-row table is exact
    assert qs[0] == p50 and qs[1] == p90


def test_streaming_epoch_sketches_merge_to_global(spark, tmp_path):
    """Incremental rollup through the exactly-once sink: each epoch commits
    its partial HLL sketches; merging ALL committed epochs equals a single
    sketch built over the whole input in batch (HLL union is lossless) —
    the streaming path to any-range distinct counts at 10^12 turns."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from arroyo_spark.streaming import (
        ExactlyOnceSink,
        FileStreamSource,
        OffsetsLedger,
        StreamProcessor,
    )
    from arroyo_spark.synth import transcripts
    from arroyo_spark.types import STREAM_SCHEMA

    root = tmp_path / "sk"
    flat = tmp_path / "sk_src"
    flat.mkdir()
    df = transcripts(spark, 40, partitions=4).cache()
    hi = df.groupBy().max("offset").collect()[0][0]
    step = hi // 3 + 1
    for i in range(3):
        part = df.filter((F.col("offset") >= i * step) & (F.col("offset") < (i + 1) * step))
        tmp = str(tmp_path / f"_s{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], str(flat / f"{i:03d}.parquet"))

    ledger = OffsetsLedger(str(root), "sk")
    sink = ExactlyOnceSink(
        output_dir=f"{root}/sk",
        ledger=ledger,
        # per-epoch partial sketches (one per role), appended across epochs
        transform=lambda b: b.groupBy("role").agg(
            F.hll_sketch_agg("conv_id", F.lit(12)).alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
    )
    StreamProcessor(
        spark=spark,
        source=FileStreamSource(str(flat), STREAM_SCHEMA, max_files_per_trigger=1),
        sink=sink,
        checkpoint_dir=f"{root}/ckpt",
    ).run_until_complete(timeout=120)
    assert len(ledger.epochs()) == 3

    merged = {
        r["role"]: r["d"]
        for r in sink.read_output(spark)
        .groupBy("role")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("d"))
        .collect()
    }
    single = {
        r["role"]: r["d"]
        for r in df.groupBy("role")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("conv_id", F.lit(12))).alias("d"))
        .collect()
    }
    df.unpersist()
    assert merged == single  # lossless union across epoch partials
