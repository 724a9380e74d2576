"""Stream source seam — the broker-facing edge of the engine.

The reference's center of gravity is a 971-line Kafka consumer
(/root/reference/arroyo/backends/kafka/consumer.py:116-756) whose
offsets/seek/pause/rebalance contract is tested by
/root/reference/tests/backends/mixins.py:16. In Spark every one of those
mechanics (partition assignment, offset tracking, rebalance, pause=admission
control) is owned by the Structured Streaming source connector; the engine's
seam is just *which* connector + options. ``StreamSource`` makes that seam a
tested object rather than a docstring claim: the same ``StreamProcessor``
runs over file, rate, kafka, or iceberg sources by swapping the source.

Admission control (the reference's backpressure/pause analog) is the
per-trigger cap option: maxFilesPerTrigger / maxOffsetsPerTrigger /
rate rowsPerSecond.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class StreamSource:
    """A readStream recipe: format + options (+ optional schema/path/decode).

    ``decode`` runs right after the read — e.g. Kafka's key/value binary
    columns to the typed transcript schema.
    """

    format: str
    options: dict[str, str] = field(default_factory=dict)
    schema: T.StructType | None = None
    path: str | None = None
    decode: Callable[[DataFrame], DataFrame] | None = None

    def __call__(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format(self.format)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        for k, v in self.options.items():
            reader = reader.option(k, str(v))
        df = reader.load(self.path) if self.path is not None else reader.load()
        return self.decode(df) if self.decode is not None else df


def file_source(
    path: str, schema: T.StructType, max_files_per_trigger: int = 1
) -> StreamSource:
    """Parquet-directory stream with bounded admission (backpressure knob).

    The sandbox stand-in for a broker: one file per micro-batch gives
    deterministic epoch slicing for the exactly-once tests.
    """
    return StreamSource(
        format="parquet",
        schema=schema,
        path=path,
        options={"maxFilesPerTrigger": str(max_files_per_trigger)},
    )


def rate_source(rows_per_second: int = 1000, num_partitions: int = 8) -> StreamSource:
    """Built-in rate source shaped to the transcript schema (synthetic
    infinite stream — smoke-tests the processor/sink path without files)."""

    def decode(df: DataFrame) -> DataFrame:
        v = F.col("value")
        return df.select(
            F.format_string("conv-%08d", v % 1000).alias("conv_id"),
            (v % 50).cast("int").alias("turn_idx"),
            F.when(v % 2 == 0, "user").otherwise("assistant").alias("role"),
            F.concat(F.lit("rate turn "), v.cast("string")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.col("timestamp").alias("ts"),
            (v % F.lit(num_partitions)).cast("int").alias("partition"),
            (v / num_partitions).cast("long").alias("offset"),
        )

    return StreamSource(
        format="rate",
        options={"rowsPerSecond": str(rows_per_second), "numPartitions": str(num_partitions)},
        decode=decode,
    )


def kafka_source(
    bootstrap_servers: str,
    topic: str,
    value_schema: T.StructType | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    codec=None,
    **extra_options: str,
) -> StreamSource:
    """Kafka topic stream (the reference consumer's seam).

    The connector owns partition assignment, offset tracking and rebalance;
    ``maxOffsetsPerTrigger`` is the pause/backpressure analog. ``decode``
    maps the binary envelope to the typed schema + (partition, offset)
    lineage columns — the BrokerValue contract
    (/root/reference/arroyo/types.py:158-196). Requires the Kafka connector
    jar on the cluster (not in this sandbox — constructor + decode logic are
    unit-tested; the live path is exercised via rate/file sources).
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        **{k: str(v) for k, v in extra_options.items()},
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)

    def decode(df: DataFrame) -> DataFrame:
        from arroyo_spark.streaming.codecs import JSON

        cdc = codec if codec is not None else JSON
        out = df.select(
            F.col("partition").cast("int").alias("partition"),
            F.col("offset").cast("long").alias("offset"),
            F.col("timestamp").alias("ts"),
            F.col("value").alias("_wire"),
        )
        if value_schema is not None:
            payload_fields = [f.name for f in value_schema.fields if f.name != "ts"]
            out = out.select(
                "partition",
                "offset",
                "ts",
                # codec seam (arroyo/utils/codecs.py contract): the same
                # ColumnCodec used by to_kafka_records decodes the envelope
                cdc.decode(F.col("_wire"), value_schema).alias("_payload"),
            ).select("partition", "offset", "ts", *[f"_payload.{c}" for c in payload_fields])
        return out

    return StreamSource(format="kafka", options=opts, decode=decode)


def iceberg_source(
    table: str,
    stream_from_timestamp: str | None = None,
    max_files_per_trigger: int | None = None,
    **extra_options: str,
) -> StreamSource:
    """Iceberg table incremental-scan stream (the north_star's 10^12-turn
    transcript table). The connector streams appended snapshots; admission =
    files per micro-batch. Requires the iceberg-spark runtime jar + catalog
    conf on the cluster (not in this sandbox)."""
    opts = dict(extra_options)
    if stream_from_timestamp is not None:
        opts["stream-from-timestamp"] = stream_from_timestamp
    if max_files_per_trigger is not None:
        opts["streaming-max-files-per-micro-batch"] = str(max_files_per_trigger)
    return StreamSource(format="iceberg", options=opts, path=table)
