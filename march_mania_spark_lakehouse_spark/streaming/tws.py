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


class _IdleTimeoutProcessor(StatefulProcessor):
    """Idle-timeout sessionizer on processing-time timers: every input
    batch for a key slides its single timer forward by ``timeout_ms``;
    when the timer fires (no input for that key for the timeout), the
    accumulated session row is emitted and the state evicted. This is
    the timer-driven half of the TWS API — output happens in
    ``handleExpiredTimer``, not on input — and the operator shape behind
    "close the visitor session N minutes after their last click".

    Scale: one ValueState tuple + one registered timer per live key;
    closed keys cost nothing. Timer firing is batch-driven, so an idle
    key's session closes at the first micro-batch after expiry."""

    def __init__(self, timeout_ms: int) -> None:
        self._timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._agg = handle.getValueState("agg", "n bigint, total double")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (self._agg.get() or (0, 0.0)) if self._agg.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._agg.update((n, total))
        # sliding timeout: drop any earlier timer, re-arm from "now"
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._timeout_ms
        )
        return iter(())

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if self._agg.exists():
            n, total = self._agg.get()
            self._agg.clear()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

    def close(self) -> None:
        pass


def idle_timeout_sessions(
    stream: DataFrame,
    key_col: str = "user_id",
    timeout_ms: int = 1,
) -> DataFrame:
    """Close a per-key session ``timeout_ms`` after the key's last
    arrival (processing time) and emit one (key, n_events, total_value)
    row per closed session. Keys still inside their timeout when the
    stream ends have open sessions and emit nothing."""
    from pyspark.sql.types import DoubleType, LongType, StructField

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    return stream.groupBy(key_col).transformWithStateInPandas(
        _IdleTimeoutProcessor(timeout_ms),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )


class _EventTimeSessionProcessor(StatefulProcessor):
    """Event-time session close: the timer is set to (max event time
    seen for the key) + gap, and fires when the WATERMARK passes it —
    so session boundaries are decided by the data's own clock, not by
    wall-clock processing cadence, and replays produce identical
    sessions (the determinism processing-time timeouts cannot give)."""

    def __init__(self, gap_ms: int) -> None:
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._agg = handle.getValueState("agg", "n bigint, total double, last_ms bigint")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total, last_ms = (
            (self._agg.get() or (0, 0.0, 0)) if self._agg.exists() else (0, 0.0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = int(pdf["ts"].max().value // 1_000_000)  # ns → ms
            last_ms = max(last_ms, batch_max)
        self._agg.update((n, total, last_ms))
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer(last_ms + self._gap_ms)
        return iter(())

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if self._agg.exists():
            n, total, last_ms = self._agg.get()
            self._agg.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_event_ms": [last_ms],
                }
            )

    def close(self) -> None:
        pass


def event_time_sessions(
    stream: DataFrame,
    key_col: str = "user_id",
    gap_ms: int = 3_600_000,
    watermark_delay: str = "0 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Close a per-key session when the watermark passes (last event
    time + gap): emits one (key, n_events, total_value, last_event_ms)
    row per closed session. Keys whose gap hasn't been out-watermarked
    when the stream drains remain open and emit nothing — exactly the
    still-open-session contract of event-time processing."""
    from pyspark.sql.types import DoubleType, LongType, StructField

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("last_event_ms", LongType()),
        ]
    )
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .transformWithStateInPandas(
            _EventTimeSessionProcessor(gap_ms),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="eventTime",
        )
    )


class _ProfileProcessor(StatefulProcessor):
    """Per-key running profile across micro-batches, exercising every TWS
    state kind the protocol offers:

    - ValueState  (n, total)          — running count/sum of ``value``
    - ListState   recent values       — bounded last-``keep_recent`` buffer
    - MapState    event_type → count  — per-category tallies

    Emits one row per key per micro-batch with the *cumulative* profile,
    so the latest emission per key equals the batch ``groupBy`` answer —
    the invariant the test checks. State is per-key in the executor
    state store; memory scales with live keys × keep_recent, not stream
    length."""

    def __init__(self, keep_recent: int = 5) -> None:
        self._keep = keep_recent

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, total double")
        self._recent = handle.getListState("recent", "v double")
        self._by_type = handle.getMapState("by_type", "event_type string", "cnt bigint")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (self._totals.get() or (0, 0.0)) if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            self._recent.appendList([(float(v),) for v in pdf["value"]])
            for et, cnt in pdf["event_type"].value_counts().items():
                prev = self._by_type.getValue((et,)) if self._by_type.containsKey((et,)) else (0,)
                self._by_type.updateValue((et,), (prev[0] + int(cnt),))
        self._totals.update((n, total))
        recent = [v for (v,) in self._recent.get()]
        if len(recent) > self._keep:
            recent = recent[-self._keep :]
            self._recent.put([(v,) for v in recent])
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "n_recent": [len(recent)],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def profile_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    keep_recent: int = 5,
) -> DataFrame:
    """Cumulative per-key profile of an event stream (count, sum, bounded
    recent-value buffer, per-event-type counts) — the grouped-state shape
    a feature-store ingest keeps per entity. One row per key per
    micro-batch; the latest row per key is the current profile."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("n_recent", IntegerType()),
            StructField("n_types", IntegerType()),
        ]
    )
    return stream.groupBy(key_col).transformWithStateInPandas(
        _ProfileProcessor(keep_recent),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


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
