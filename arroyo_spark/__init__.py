"""arroyo_spark — a from-scratch PySpark-native streaming/analytics engine.

Re-expresses the observable semantics of getsentry/arroyo's
processing-strategy algebra (Map/Filter/Reduce/Batch/Unfold/Produce/
CommitOffsets, see /root/reference/arroyo/processing/strategies/) as
idiomatic Spark DataFrame / Structured Streaming plans:

- RunTask / RunTaskWithMultiprocessing  -> built-in column exprs + pandas UDFs
- FilterStep                            -> DataFrame.filter
- Reduce / Buffer / BatchStep           -> event-time windowed aggregations
- Unfold / UnbatchStep                  -> explode
- Produce + CommitOffsets + CommitPolicy-> exactly-once foreachBatch sink with
                                           an idempotent per-epoch offsets ledger
- StreamProcessor                       -> checkpointed streaming query driver
- dlq                                   -> DLQ split + epoch-level limits

This is NOT a port: none of the reference's mechanics (poll loops,
shared-memory blocks, sentinel messages) exist here — only the observable
contract (which rows come out, which offsets are committed, what survives a
restart) is reproduced, Spark-first.
"""

__version__ = "0.1.0"

from arroyo_spark.session import get_spark  # noqa: F401
