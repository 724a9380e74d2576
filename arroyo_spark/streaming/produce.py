"""Produce — mid-pipeline publish + multi-stage DAG composition.

Reference: the Produce strategy publishes each processed message to a
topic and forwards it downstream
(/root/reference/arroyo/processing/strategies/produce.py:23-167). Two
Spark-first forms:

1. ``to_kafka_records`` / ``kafka_writer``: the real-cluster seam — encode
   rows to the Kafka sink envelope (key/value) and configure
   ``writeStream.format("kafka")``. The encode is plain column expressions
   (unit-testable without a broker); the jar lives on the cluster.
2. ``PipeTopic`` + ``produce_chain``: the sandbox/file analog — a
   directory-backed topic. Stage N's exactly-once sink output is stage
   N+1's stream source. ``produce_chain`` runs the stages as sequential
   availableNow queries: each stage drains fully before the next starts,
   so a stage only ever reads COMMITTED upstream epochs (crash-restart
   reruns from the ledger; epoch dirs are idempotent overwrites).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arroyo_spark.streaming.ledger import OffsetsLedger
from arroyo_spark.streaming.processor import StreamProcessor
from arroyo_spark.streaming.sink import ExactlyOnceSink


def to_kafka_records(
    df: DataFrame,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    codec=None,
) -> DataFrame:
    """Encode rows into the Kafka sink envelope: (key, value).

    value = ``codec``-encoded struct of ``value_cols`` (default codec JSON,
    default cols: all non-key columns); key = concatenated ``key_cols``
    (partitioning key on the topic — keep it the conversation key so
    per-conv_id ordering survives the hop). The codec seam mirrors
    arroyo/utils/codecs.py:9-25 — pass ``codecs.BINARY_JSON`` for
    binary-valued topics or any custom ``ColumnCodec``.
    """
    from arroyo_spark.streaming.codecs import JSON

    codec = codec if codec is not None else JSON
    key_cols = key_cols or []
    value_cols = value_cols or [c for c in df.columns if c not in key_cols]
    out = df.select(
        *(
            [F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]).alias("key")]
            if key_cols
            else []
        ),
        codec.encode(F.struct(*[F.col(c) for c in value_cols])).alias("value"),
    )
    return out


def kafka_writer(df: DataFrame, topic: str, bootstrap_servers: str, checkpoint_dir: str):
    """Configure the kafka writeStream (requires the connector jar on the
    cluster; not executable in this sandbox — the encode above is)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )


@dataclass
class PipeTopic:
    """Directory-backed topic: exactly-once sink on the write side, file
    stream on the read side."""

    root: str
    name: str

    def sink(self, **sink_kwargs) -> ExactlyOnceSink:
        ledger = OffsetsLedger(self.root, self.name)
        return ExactlyOnceSink(output_dir=f"{self.root}/{self.name}", ledger=ledger, **sink_kwargs)

    def source(self, spark: SparkSession, max_files_per_trigger: int = 4):
        """Stream source over the committed output (schema inferred from the
        written epochs; call only after the producing stage drained).

        Construction fails if any ``epoch=N`` dir under data/ is NOT in the
        ledger — an orphan left by a producer that crashed between data
        write and ledger commit must not leak downstream (the downstream
        stage would otherwise read an uncommitted, possibly partial epoch).
        """
        import os
        import re

        from arroyo_spark.streaming.sources import StreamSource

        data_dir = f"{self.root}/{self.name}/data"
        committed = set(OffsetsLedger(self.root, self.name).epochs())
        orphans = sorted(
            int(m.group(1))
            for d in (os.listdir(data_dir) if os.path.isdir(data_dir) else [])
            if (m := re.fullmatch(r"epoch=(\d+)", d)) and int(m.group(1)) not in committed
        )
        if orphans:
            raise RuntimeError(
                f"uncommitted epoch dirs under {data_dir}: {orphans} — the "
                "producer crashed after writing data but before the ledger "
                "commit; rerun the producing stage (idempotent overwrite) or "
                "remove the orphan dirs before reading this topic"
            )
        schema_file = f"{self.root}/{self.name}/schema.json"
        if os.path.exists(schema_file):
            # written by the sink at first commit: no batch-inference scan
            import json

            from pyspark.sql import types as T

            with open(schema_file) as f:
                schema = T.StructType.fromJson(json.load(f))
        else:
            schema = spark.read.option("recursiveFileLookup", "true").parquet(data_dir).schema
        return StreamSource(
            format="parquet",
            schema=schema,
            path=data_dir,
            options={
                "maxFilesPerTrigger": str(max_files_per_trigger),
                "recursiveFileLookup": "true",
            },
        )


def produce_chain(
    spark: SparkSession,
    source: Callable[[SparkSession], DataFrame],
    stages: list[tuple[str, Callable[[DataFrame], DataFrame] | None]],
    root: str,
    sink_kwargs_by_stage: dict[str, dict] | None = None,
) -> list[ExactlyOnceSink]:
    """Run a Produce-composed DAG: stage_i(pipeline) -> topic_i -> stage_i+1.

    Each stage is its own availableNow streaming query with an exactly-once
    sink; returns the per-stage sinks (read results via
    ``sinks[i].read_output(spark)``).
    """
    sinks: list[ExactlyOnceSink] = []
    src = source
    kw = sink_kwargs_by_stage or {}
    for name, pipeline in stages:
        topic = PipeTopic(root, name)
        sink = topic.sink(**kw.get(name, {}))
        StreamProcessor(
            spark=spark,
            source=src,
            sink=sink,
            checkpoint_dir=f"{root}/{name}/ckpt",
            pipeline=pipeline,
        ).run_until_complete()
        sinks.append(sink)
        src = topic.source(spark)
    return sinks
