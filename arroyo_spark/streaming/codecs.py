"""Payload codecs — the encode/decode seam for topics.

Reference contract (/root/reference/arroyo/utils/codecs.py:9-25): a
``Codec`` is an Encoder+Decoder pair the producer/consumer pipe every
payload through (e.g. the JSON CommitCodec at
arroyo/backends/kafka/commit.py:19-102). The reference encodes ONE value
per Python call; Spark-first means the codec emits COLUMN EXPRESSIONS, so
encoding a billion rows is still one JVM-side projection — no per-row
Python in the hot path.

``JSON`` (string payloads) and ``BINARY_JSON`` (utf-8 bytes — topics whose
consumers expect binary values) ship here; a custom format plugs in by
implementing the two methods (e.g. Avro via pyspark.sql.avro's
``to_avro``/``from_avro`` where the spark-avro jar is on the cluster).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ColumnCodec(ABC):
    """Encode a struct column into a wire column and back."""

    @abstractmethod
    def encode(self, value: Column) -> Column:
        """struct -> wire (string or binary) column."""

    @abstractmethod
    def decode(self, col: Column, schema: T.StructType) -> Column:
        """wire column -> struct column with ``schema``."""


class JsonCodec(ColumnCodec):
    """JSON string payloads (the reference's default wire format)."""

    def encode(self, value: Column) -> Column:
        return F.to_json(value)

    def decode(self, col: Column, schema: T.StructType) -> Column:
        # cast covers both string and binary(utf-8) wire columns
        return F.from_json(col.cast("string"), schema)


class BinaryJsonCodec(JsonCodec):
    """JSON encoded to utf-8 bytes — for binary-valued topics."""

    def encode(self, value: Column) -> Column:
        return F.to_json(value).cast("binary")


JSON = JsonCodec()
BINARY_JSON = BinaryJsonCodec()
