"""Event-time windowed aggregation over the `events` table (E5/E6).

The same transformation function serves batch DataFrames and Structured
Streaming DataFrames — `F.window` + groupBy is identical in both; the
streaming entry just adds a watermark for state cleanup.

Scale: tumbling windows are a single shuffle keyed by (window, keys);
sliding windows multiply rows by window/slide before the shuffle (Spark
expands each event into every window it falls in). Watermarks bound the
streaming state store.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.functions.numeric import dsum


def tumbling_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(window, keys): event count + exact sum of value."""
    return (
        events.groupBy(F.window(ts_col, window_len).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(value_col, "sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), *keys, "n_events", "sum_value")
    )


def sliding_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sliding-window variant: each event contributes to window/slide windows."""
    return (
        events.groupBy(F.window(ts_col, window_len, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(value_col, "sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), *keys, "n_events", "sum_value")
    )


def streaming_tumbling_agg(
    stream: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Structured Streaming version: same plan + watermark for late data.

    Usage: ``spark.readStream...`` → this → ``.writeStream.outputMode(
    "append")``. Late events beyond the watermark are dropped and window
    state is evicted — bounded state at any throughput.
    """
    return tumbling_agg(
        stream.withWatermark(ts_col, watermark), window_len, keys, ts_col, value_col
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, session) aggregate over gap-based ``session_window`` —
    the batch form; identical plan to q63_session_window_native."""
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(value_col, "sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def streaming_session_agg(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 second",
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Structured Streaming sessionization: the SAME ``session_window``
    plan with a watermark. Sessions merge across micro-batches in the
    state store and finalize (append-mode emit + state eviction) once
    the watermark passes session_end + gap — state is bounded by open
    sessions per key, not stream length. The tail of sessions still open
    at end-of-stream stays in state (append-mode semantics), which is
    exactly what a resumable 100 TB ingest wants.
    """
    return session_agg(
        stream.withWatermark(ts_col, watermark), gap, keys, ts_col, value_col
    )


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once → effectively-once ingest dedup with the built-in
    ``dropDuplicatesWithinWatermark``: keeps the first arrival of each
    key and suppresses re-deliveries that land within the watermark
    horizon, while the state store evicts keys older than the watermark
    — state is bounded by (keys/hour × horizon), not stream length.

    This is the engine-native counterpart of `streaming/tws.py:
    dedup_stream` (which trades the fixed horizon for explicit
    per-key TTL state via transformWithStateInPandas).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def parse_props(events: DataFrame, field: str = "k") -> DataFrame:
    """JSON extraction from the `props` string column (E5) — JVM-side
    ``get_json_object``, no Python."""
    return events.withColumn(
        f"props_{field}",
        F.get_json_object(F.col("props"), f"$.{field}").cast("int"),
    )


def stream_stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lower_s: int = -3600,
    upper_s: int = 0,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream–stream join on key equality + an event-time range
    (right_ts in [left_ts+lower_s, left_ts+upper_s)); ``how`` may be
    "inner" or "leftOuter" (unmatched left rows emit with nulls once
    the watermark passes their match window).

    Watermarks on BOTH sides bound the join state: a buffered left row
    can be evicted once the right watermark passes its upper bound and
    vice versa — without them the state store grows with the stream.
    This is the streaming twin of ``operators/temporal.range_join``
    (batch proves correctness; this proves the plan runs incrementally).

    Outer-emission caveats a consumer must know (both empirically
    pinned in tests/test_streaming.py): the eviction watermark is the
    MIN over both inputs — a left row's unmatched form can only emit
    after BOTH sides' event time passes its match window; and
    availableNow's final no-data batch flushes with the watermark of
    the last DATA batch (one-batch lag), so a drained stream flushes
    exactly the rows whose windows closed before that batch's maximum.
    """
    l = left_stream.withWatermark(left_ts, watermark)
    r = right_stream.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"{key} = __rkey AND {right_ts} >= {left_ts} + INTERVAL {lower_s} SECOND "
        f"AND {right_ts} < {left_ts} + INTERVAL {upper_s} SECOND"
    )
    return l.join(r.withColumnRenamed(key, "__rkey"), cond, how).drop("__rkey")


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream–static enrichment join: each micro-batch joins the
    (bounded, slowly-changing) dimension as a plain batch join — no
    watermark and no join state, because the static side is re-resolved
    per micro-batch (which is also why a dim REFRESH is picked up on the
    next batch). The explicit broadcast pins the physical plan: the
    stream side never shuffles for the join, exactly the contract of
    `operators/joins.py:star_join` in batch."""
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(F.broadcast(dim), on=keys, how=how)
