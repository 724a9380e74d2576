"""Deterministic, fully distributed synthetic transcript generation.

The reference tests against hand-built message sequences on an in-memory
broker (/root/reference/arroyo/backends/local/backend.py:32-133). Our
equivalent is a seeded generator expressed entirely in Spark column
expressions (``spark.range`` + ``xxhash64`` + ``sequence``/``explode``), so
generation itself is partition-parallel and works unchanged at 10^12-turn
scale — no driver-side loops, no Python RNG in the hot path.

Schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string, tool string,
     ts timestamp) + broker lineage columns (partition int, offset long).

Skew: the first ``n_convs // hot_ratio`` conversations get ``hot_turns``
turns (vs median ~8) to exercise conv_id salting + AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arroyo_spark.types import TOOL_VOCAB

# deterministic token vocabulary (syllable product — no RNG needed)
_SYLLABLES_A = ("da", "re", "mo", "ka", "lu", "si", "ten", "vor", "pla", "qui")
_SYLLABLES_B = ("ta", "nix", "ron", "bel", "sum", "gor", "li", "za", "eth", "um")
VOCAB = tuple(a + b for a in _SYLLABLES_A for b in _SYLLABLES_B)  # 100 words


def conversations(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    median_turns: int = 8,
    hot_ratio: int = 1000,
    hot_turns: int = 2000,
) -> DataFrame:
    """One row per conversation: (conv_seq, conv_id, n_turns, conv_start, delta_s)."""
    n_hot = max(1, n_convs // hot_ratio) if n_convs >= hot_ratio else 0
    conv = spark.range(n_convs).withColumnRenamed("id", "conv_seq")
    h = lambda *cols: F.xxhash64(F.lit(seed), *cols)  # noqa: E731
    return (
        conv.withColumn("conv_id", F.format_string("conv-%08d", F.col("conv_seq")))
        .withColumn(
            "n_turns",
            F.when(
                F.col("conv_seq") < F.lit(n_hot),
                F.lit(hot_turns) + F.pmod(h(F.col("conv_seq")), F.lit(hot_turns)),
            ).otherwise(
                F.lit(2) + F.pmod(h(F.col("conv_seq")), F.lit(2 * median_turns - 3)),
            ).cast("int"),
        )
        # conversations interleaved across wall clock, 7s apart
        .withColumn(
            "conv_start",
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("conv_seq") % 86400) * 7),
        )
        # per-conversation inter-turn gap: 0.5 .. 30.0 s
        .withColumn(
            "delta_s",
            (F.lit(5) + F.pmod(h(F.col("conv_seq"), F.lit(1)), F.lit(296))) / F.lit(10.0),
        )
    )


def transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    partitions: int = 8,
    median_turns: int = 8,
    hot_ratio: int = 1000,
    hot_turns: int = 2000,
    late_pct: int = 2,
    with_lineage: bool = True,
    text_words_max: int = 40,
) -> DataFrame:
    """Generate the transcript table, optionally with (partition, offset).

    ``offset`` is a dense 0-based per-partition sequence in event order —
    the BrokerValue contract (/root/reference/arroyo/types.py:158-196).
    Computing it needs one row_number window per source partition; with P
    sized to the cluster this is P parallel sorts (synthesis-only cost —
    a real broker/Iceberg source carries its own offsets).
    """
    conv = conversations(spark, n_convs, seed, median_turns, hot_ratio, hot_turns)
    h = lambda *cols: F.xxhash64(F.lit(seed), *cols)  # noqa: E731

    turns = conv.select(
        "conv_id",
        "conv_start",
        "delta_s",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    r_role = F.pmod(h(F.col("conv_id"), F.col("turn_idx"), F.lit(2)), F.lit(100))
    role = (
        F.when((F.col("turn_idx") == 0) & (r_role < 10), F.lit("system"))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .when(r_role < 15, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    tool_arr = F.array(*[F.lit(t) for t in TOOL_VOCAB])
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    n_words = (
        F.lit(3)
        + F.pmod(h(F.col("conv_id"), F.col("turn_idx"), F.lit(3)), F.lit(text_words_max))
        # heavy tail: 2% of turns are 8x longer
        + F.when(
            F.pmod(h(F.col("conv_id"), F.col("turn_idx"), F.lit(4)), F.lit(50)) == 0,
            F.lit(8 * text_words_max),
        ).otherwise(F.lit(0))
    )
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: F.element_at(
                vocab_arr,
                F.pmod(h(F.col("conv_id"), F.col("turn_idx"), i, F.lit(5)), F.lit(len(VOCAB))).cast(
                    "int"
                )
                + 1,
            ),
        ),
        " ",
    )
    base_ts = F.col("conv_start") + F.make_interval(secs=F.col("turn_idx") * F.col("delta_s"))
    # ~late_pct% of turns arrive 1-10 minutes late (event time pushed back)
    late = F.pmod(h(F.col("conv_id"), F.col("turn_idx"), F.lit(6)), F.lit(100)) < F.lit(late_pct)
    late_by = F.lit(60) + F.pmod(h(F.col("conv_id"), F.col("turn_idx"), F.lit(7)), F.lit(540))
    ts = F.when(late, base_ts - F.make_interval(secs=late_by)).otherwise(base_ts)

    df = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(
            role == "tool",
            F.element_at(
                tool_arr,
                F.pmod(h(F.col("conv_id"), F.col("turn_idx"), F.lit(8)), F.lit(len(TOOL_VOCAB))).cast(
                    "int"
                )
                + 1,
            ),
        ).alias("tool"),
        ts.alias("ts"),
    )
    if not with_lineage:
        return df

    from pyspark.sql import Window as W

    part = F.pmod(F.xxhash64(F.col("conv_id")), F.lit(partitions)).cast("int")
    w = W.partitionBy("partition").orderBy("ts", "conv_id", "turn_idx")
    return (
        df.withColumn("partition", part)
        .withColumn("offset", F.row_number().over(w).cast("long") - 1)
    )


def tool_calls(transcripts_df: DataFrame, seed: int = 42, orphan_pct: int = 1) -> DataFrame:
    """Join-side table: one call per role='tool' turn + ~orphan_pct% orphans.

    status ~5% error / ~3% timeout (DLQ routing fixture); completion ts is
    0.1-60 s after the turn (sometimes past the watermark -> late-join case).
    """
    h = lambda *cols: F.xxhash64(F.lit(seed + 1), *cols)  # noqa: E731
    base = transcripts_df.filter(F.col("role") == "tool").select("conv_id", "turn_idx", "tool", "ts")
    r = F.pmod(h(F.col("conv_id"), F.col("turn_idx")), F.lit(100))
    calls = base.select(
        "conv_id",
        "turn_idx",
        F.concat_ws("#", F.col("conv_id"), F.col("turn_idx")).alias("call_id"),
        "tool",
        F.when(r < 5, F.lit("error")).when(r < 8, F.lit("timeout")).otherwise(F.lit("ok")).alias(
            "status"
        ),
        (
            F.col("ts")
            + F.make_interval(
                secs=(F.lit(1) + F.pmod(h(F.col("conv_id"), F.col("turn_idx"), F.lit(1)), F.lit(599)))
                / F.lit(10.0)
            )
        ).alias("ts"),
    )
    orphan_src = base.filter(
        F.pmod(h(F.col("conv_id"), F.lit(9)), F.lit(100)) < F.lit(orphan_pct)
    )
    orphans = orphan_src.select(
        "conv_id",
        (F.col("turn_idx") + 100000).cast("int").alias("turn_idx"),
        F.concat_ws("#", F.col("conv_id"), F.col("turn_idx") + 100000).alias("call_id"),
        "tool",
        F.lit("ok").alias("status"),
        (F.col("ts") + F.make_interval(secs=F.lit(3600))).alias("ts"),
    )
    return calls.unionByName(orphans)
