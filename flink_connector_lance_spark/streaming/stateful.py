"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming at all (its source is bounded,
its sink buffer-flushes on checkpoint — SURVEY.md §1.1); these operators
are part of the beyond-reference streaming surface: event streams get
watermarked event-time windows (built-in, see queries ``events_tumbling_window``
batch shape) and custom per-key state machines (here).

``running_counts`` keeps a per-key (count, sum) accumulator across
micro-batches and emits the updated totals each batch — the canonical
shape for streaming feature accumulation over a 100 TB/day event firehose
(state is hash-partitioned by key; each executor owns a key range)."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("events", LongType()),
    StructField("total_value", DoubleType()),
])


def _update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
            ) -> Iterator[pd.DataFrame]:
    events, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        events += len(pdf)
        total += float(pdf["value"].sum())
    state.update((events, total))
    yield pd.DataFrame({"key": [key[0]], "events": [events], "total_value": [total]})


def running_counts(stream_df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Input: a streaming DataFrame with ``key_col`` and ``value_col``.
    Output stream: one updated (key, events, total_value) row per key per
    batch (update mode)."""
    keyed = stream_df.selectExpr(f"CAST({key_col} AS STRING) AS key",
                                 f"CAST({value_col} AS DOUBLE) AS value")
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
