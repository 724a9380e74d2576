"""Synthetic source determinism + schema contract (input_hint)."""

from __future__ import annotations

from arroyo_spark.synth import tool_calls, transcripts


def test_schema_matches_input_hint(spark):
    df = transcripts(spark, 20, partitions=4)
    assert df.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp,partition:int,offset:bigint>"
    )


def test_generation_is_deterministic(spark):
    a = transcripts(spark, 50, partitions=4).collect()
    b = transcripts(spark, 50, partitions=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_offsets_dense_per_partition(spark):
    df = transcripts(spark, 50, partitions=4)
    from pyspark.sql import functions as F

    stats = (
        df.groupBy("partition")
        .agg(F.count("*").alias("n"), F.min("offset").alias("lo"), F.max("offset").alias("hi"))
        .collect()
    )
    for r in stats:
        assert r.lo == 0 and r.hi == r.n - 1  # dense 0-based per partition


def test_turns_dense_per_conversation(spark):
    from pyspark.sql import functions as F

    df = transcripts(spark, 30, with_lineage=False)
    stats = df.groupBy("conv_id").agg(
        F.count("*").alias("n"), F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi")
    )
    for r in stats.collect():
        assert r.lo == 0 and r.hi == r.n - 1


def test_tool_calls_reference_tool_turns(spark):
    from pyspark.sql import functions as F

    t = transcripts(spark, 100, with_lineage=False)
    tc = tool_calls(t)
    n_tool_turns = t.filter(F.col("role") == "tool").count()
    n_calls = tc.count()
    assert n_calls >= n_tool_turns  # 1:1 + orphans
    # orphan turn_idx are shifted by +100000 so they never match a real turn
    joined = tc.join(t, ["conv_id", "turn_idx"], "left_anti")
    assert joined.count() == n_calls - n_tool_turns


def test_skewed_hot_conversation(spark):
    from pyspark.sql import functions as F

    df = transcripts(spark, 2000, with_lineage=False, hot_ratio=1000, hot_turns=500)
    sizes = df.groupBy("conv_id").count()
    top = sizes.orderBy(F.desc("count")).first()
    med = sizes.approxQuantile("count", [0.5], 0.01)[0]
    assert top["count"] >= 50 * med  # heavy skew present to exercise salting
