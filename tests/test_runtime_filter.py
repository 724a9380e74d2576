"""Runtime bloom-filter join pruning: the big-big-join scan killer.

broadcast() handles small-dim joins; at 100 TB the expensive shape is
big JOIN big where one side carries a selective predicate. Spark's
runtime filtering (SPARK-32268) builds a bloom filter from the filtered
(creation) side and injects `might_contain(...)` into the other side's
scan, pruning rows BEFORE the shuffle — the shuffle that would otherwise
move ~the whole probe side. This test pins the mechanics so the engine's
join family keeps qualifying for the injection: if a refactor makes the
join keys non-attributable (e.g. wraps them in a UDF) the rule silently
stops firing and only a plan assert catches it.

Thresholds: injection requires creation side < creationSideThreshold and
probe side > applicationSideScanSizeThreshold (10 GB default — sized for
real clusters). We lower the application threshold to 0 to exercise the
rule at test scale; production keeps defaults so the filter only appears
where a 100 TB scan makes it worth building.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def rf_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.enabled": "false",  # stable plan string
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_into_probe_scan(rf_conf, tmp_path):
    spark = rf_conf
    # parquet-backed so both sides have real scan-size statistics
    probe_p, build_p = str(tmp_path / "probe"), str(tmp_path / "build")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("payload")
    ).write.parquet(probe_p)
    spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("tag")
    ).write.parquet(build_p)

    probe = spark.read.parquet(probe_p)
    build = spark.read.parquet(build_p).filter(F.col("tag") == 3)  # selective
    joined = probe.join(build, "k")

    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "might_contain" in plan or "bloomfilter" in plan, plan[:2000]
    # and it still answers correctly (50000/97 -> 516 matching build keys)
    assert joined.count() == 516


def test_no_bloom_filter_below_production_thresholds(rf_conf, tmp_path):
    """With the production application-side threshold (10 GB) restored,
    tiny scans do NOT pay the bloom-build — the rule is cost-gated, not
    always-on."""
    spark = rf_conf
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10GB",
    )
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(0, 10_000).select(F.col("id").alias("k")).write.parquet(p1)
    spark.range(0, 1_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("tag")
    ).write.parquet(p2)
    joined = spark.read.parquet(p1).join(
        spark.read.parquet(p2).filter(F.col("tag") == 1), "k"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "might_contain" not in plan
    assert joined.count() == 200
