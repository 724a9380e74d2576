"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (tumbling-window per-conversation
Reduce over the transcript stream) at sf0.001; ``queries()``/``oracle_sql()``
expose every implemented operator from SURVEY.md §2 with DuckDB oracles.
Implementations live in arroyo_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from arroyo_spark import queries as q

    return q.QUERIES["reduce_tumbling"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from arroyo_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from arroyo_spark import queries as q

    return q.oracle_sql()
