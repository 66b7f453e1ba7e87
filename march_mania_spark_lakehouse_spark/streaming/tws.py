"""Ingest-time streaming dedup via ``transformWithStateInPandas``
(Spark 4's arbitrary-stateful-processing API).

The training-pipeline shape: events arrive continuously and the same
record can be delivered more than once (at-least-once sources, replays);
downstream wants each record exactly once. Spark's built-in
``dropDuplicates`` on a stream needs a watermark to bound state and
silently re-admits keys after eviction; a ``StatefulProcessor`` gives the
same dedup with *explicit* state control — a per-key ValueState marks
"seen", an optional TTL bounds the state store instead of a watermark,
and the emit decision is visible code, not a planner rule.

Scale: state is partitioned by the dedup key across executor state
stores (RocksDB on a cluster), so memory scales with live keys per
executor, not stream length; TTL turns "exactly once, ever" into
"exactly once within the replay horizon", which is the bounded-state
contract a 100 TB/day ingest actually runs with.

Runtime requirements (both verified end-to-end in
``tests/test_streaming.py::test_tws_dedup_stream_exactly_once_across_microbatches``):

- ``transformWithStateInPandas`` speaks a protobuf protocol between the
  JVM and its Python state server. Real deployments have the
  ``protobuf`` package; in containers without it the session factory
  activates the vendored miniproto runtime
  (``vendor/miniproto/google/protobuf/_mini.py``), a clean-room minimal
  wire-format implementation that this protocol runs on unmodified.
- The state store must support column families: set
  ``spark.sql.streaming.stateStore.providerClass`` to
  ``...state.RocksDBStateStoreProvider`` (bundled with Spark; also the
  provider you want at 100 TB — the HDFS-backed default keeps state in
  executor heap, RocksDB spills to local disk).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StructType


class _DedupProcessor(StatefulProcessor):
    """Emit only the first row ever observed for each grouping key."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "seen boolean", self._ttl_ms)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        first: pd.DataFrame | None = None
        if not self._seen.exists():
            for pdf in rows:
                if len(pdf):
                    first = pdf.iloc[[0]]
                    break
            self._seen.update((True,))
        # Drain: the contract requires consuming the iterator even when
        # the key is a duplicate and nothing is emitted.
        for _ in rows:
            pass
        if first is not None:
            yield first

    def close(self) -> None:
        pass


def dedup_stream(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ttl_ms: int | None = None,
) -> DataFrame:
    """Exactly-once stream dedup on ``key_cols``: the first arrival of
    each key passes through (full row), every later duplicate — in the
    same micro-batch or any later one — is dropped. ``ttl_ms`` bounds
    per-key state lifetime (None = dedup forever, unbounded state).
    Output schema = input schema; append semantics.
    """
    out_schema = StructType([stream.schema[c] for c in stream.columns])
    return stream.groupBy(*key_cols).transformWithStateInPandas(
        _DedupProcessor(ttl_ms),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
