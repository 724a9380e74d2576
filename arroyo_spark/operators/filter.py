"""Filter operator — FilterStep.

Reference: drops messages failing ``function``; with a commit policy it
emits ``FilteredPayload`` sentinel messages so downstream commits still
advance through 100%-filtered streams
(/root/reference/arroyo/processing/strategies/filter.py:20-127).

Spark mapping: ``df.filter``. The sentinel machinery is intentionally
absent: the exactly-once sink commits *source offset ranges per epoch*
(arroyo_spark.streaming.ledger), so offsets advance regardless of how many
rows survive a filter — the observable contract (ledger advancement under
total filtering) is covered by tests/test_streaming tests instead of
tombstone rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def filter_step(df: DataFrame, predicate: Column | str) -> DataFrame:
    return df.filter(predicate)
