"""Pipeline composition — the ProcessingStrategyFactory analog.

Reference: pipelines are built inside-out, terminal-first —
``RunTask(f, Produce(producer, topic, CommitOffsets(commit)))``
(/root/reference/docs/source/getstarted.rst, examples/transform_and_produce/
batched.py:50-84); each strategy holds its next_step and
``create_with_partitions`` re-instantiates the chain per assignment
(/root/reference/arroyo/processing/strategies/abstract.py:99-128).

Spark mapping: a pipeline is a left-to-right composition of
``DataFrame -> DataFrame`` transforms; Catalyst "instantiates" it per
micro-batch. ``Pipeline`` makes the chain a first-class object so the same
plan can be applied to a batch table, a streaming source, or inside
foreachBatch — mirroring how one strategy factory serves any assignment.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame

Stage = Callable[[DataFrame], DataFrame]


@dataclass(frozen=True)
class Pipeline:
    stages: tuple[Stage, ...] = field(default_factory=tuple)

    def then(self, stage: Stage, *args, **kwargs) -> "Pipeline":
        """Append a stage; extra args are partially applied:
        ``p.then(filter_step, F.col('role') != 'system')``."""
        if args or kwargs:
            fn = lambda df: stage(df, *args, **kwargs)  # noqa: E731
        else:
            fn = stage
        return Pipeline(self.stages + (fn,))

    def __call__(self, df: DataFrame) -> DataFrame:
        return reduce(lambda acc, s: s(acc), self.stages, df)

    def __or__(self, stage: Stage) -> "Pipeline":
        return self.then(stage)


def pipeline(*stages: Stage) -> Pipeline:
    return Pipeline(tuple(stages))
