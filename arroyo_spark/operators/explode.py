"""Flat-map operators — Unfold and UnbatchStep.

Reference: Unfold applies ``generator: T -> Iterable[BaseValue]`` and
submits each generated message, patching the original committable onto the
last one (/root/reference/arroyo/processing/strategies/unfold.py:12-121);
UnbatchStep explodes a ValuesBatch back into messages
(/root/reference/arroyo/processing/strategies/batching.py:99-139).

Spark mapping: ``explode``. Committable patching is unnecessary — epoch
offset ranges commit independently of row multiplicity (see
arroyo_spark.streaming.ledger).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unfold(df: DataFrame, generator: Column, alias: str, keep: list[str] | None = None) -> DataFrame:
    """Explode a generated array column into one row per element.

    ``generator`` is any array-valued expression (the declarative analog of
    the reference's generator callable), e.g. ``F.split(col, ' ')``.
    """
    cols = keep if keep is not None else df.columns
    return df.select(*cols, F.explode(generator).alias(alias))


def unbatch(df: DataFrame, batch_col: str, keep: list[str] | None = None) -> DataFrame:
    """Explode a batch column (array<struct>) back into rows, unpacking the struct."""
    cols = keep if keep is not None else [c for c in df.columns if c != batch_col]
    exploded = df.select(*cols, F.explode(F.col(batch_col)).alias("_elem"))
    return exploded.select(*cols, "_elem.*")
