"""Custom stateful streaming operator via ``applyInPandasWithState``.

Where the built-in streaming aggregations don't fit (per-key running
state with arbitrary update logic), Structured Streaming's escape
hatch is ``applyInPandasWithState``: state lives in the checkpointed
state store, updates arrive as Arrow batches per key group, and the
operator emits whatever rows it likes each trigger.

This module ships the canonical example — per-key running totals over
the CDC envelope stream (events-per-key and amount sum), the
streaming analog of a ``groupBy(key).agg(count, sum)`` that must
survive restarts and emit incrementally. The update function is
deliberately tiny: all heavy lifting (shuffle to key groups, Arrow
transfer, state persistence) is the engine's.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_events bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["_value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})


def running_totals(
    stream: DataFrame, *, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum) emitted every trigger a key appears.

    Works on any streaming DataFrame; keys shuffle to their state
    partition once per trigger, state size is O(distinct keys).
    """
    prepared = stream.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"CAST({value_col} AS DOUBLE) AS _value"
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
