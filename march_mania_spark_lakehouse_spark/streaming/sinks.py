"""Streaming sinks: foreachBatch with idempotent writes, plus the
observe() metrics hook shared by batch jobs.

``foreachBatch`` is the general-purpose streaming sink — it hands each
micro-batch to arbitrary batch-writer code. Exactly-once then hinges on
the writer being *idempotent per (batch_id)*: Structured Streaming
replays a batch after a crash with the SAME batch_id, so a write keyed
on batch_id (dynamic partition overwrite) lands identically on replay
instead of duplicating.

``observe`` attaches named aggregate metrics to a DataFrame that are
collected as a side effect of whatever action runs it — row counts and
quality counters for free on a production write, no second scan
(pairs with `operators/dq.py`, which is the standalone-report form).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def start_idempotent_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """writeStream.foreachBatch → parquet partitioned by batch_id with
    dynamic partition overwrite: a replayed micro-batch overwrites its
    own partition (idempotent), committed batches are untouched.
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def observed(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named observe() metrics; read ``obs.get`` after an action.

    Metrics must be aggregate expressions (count/sum/min/max...). They
    are computed inside the same physical plan as the action — a write
    gets its row count and violation counters with zero extra scans.
    """
    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs


def count_violations(*preds: tuple[str, Column]) -> dict[str, Column]:
    """Build observe()-compatible violation counters from predicates."""
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for name, pred in preds:
        out[name] = F.sum(F.when(pred, 1).otherwise(0))
    return out


def start_hll_merge_sink(
    stream_df: DataFrame,
    key_col: str,
    state_path: str,
    checkpoint_dir: str,
    lg_k: int = 12,
):
    """Incremental distinct counting over a stream: each micro-batch is
    reduced to ONE HLL sketch row and unioned into a persistent state
    sketch (`operators/sketch.py` family) — running distinct-so-far
    without ever storing keys.

    Replay safety comes from the algebra, not bookkeeping: HLL union is
    idempotent (register-wise max), so a crash-replayed micro-batch
    merges to the identical state. State is one row of ≤2^lg_k bytes
    regardless of stream length — compare `events.py:
    dedup_within_watermark`, whose state is keys-per-horizon.

    Returns the StreamingQuery; read ``state_path`` for
    (n_batches, approx_distinct).
    """
    import os

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = batch_df.agg(
            F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sk")
        ).select(F.lit(1).alias("n_batches"), "sk")
        if os.path.exists(state_path):
            old = spark.read.parquet(state_path).select("n_batches", "sk")
            # collect the 1-row old state so the overwrite below never
            # reads the files it is replacing
            merged_rows = (
                old.unionByName(new)
                .agg(
                    F.sum("n_batches").alias("n_batches"),
                    F.hll_union_agg("sk").alias("sk"),
                )
                .collect()
            )
            from march_mania_spark_lakehouse_spark.sources.local_rows import (
                local_df,
            )

            new = local_df(spark, merged_rows, "n_batches long, sk binary")
        out = new.select(
            "n_batches",
            "sk",
            F.hll_sketch_estimate("sk").alias("approx_distinct"),
        )
        out.write.mode("overwrite").parquet(state_path)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_delta_append_sink(
    stream_df: DataFrame,
    table: str,
    checkpoint_dir: str,
    app_id: str = "march_mania_spark_lakehouse_stream",
) -> StreamingQuery:
    """Exactly-once streaming append into a Delta-format table
    (`sources/delta_log.py`) via the spec's SetTransaction protocol:
    every commit carries ``txn = (app_id, batch_id)``, and a replayed
    micro-batch (same batch_id after a crash/restart) is skipped when
    the log already holds its transaction — the write-side idempotence
    check the real Delta streaming sink performs. The offset WAL
    guarantees the same batch_id on replay; the txn action makes the
    redelivery a no-op instead of a duplicate."""
    from march_mania_spark_lakehouse_spark.sources import delta_log

    def _append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= delta_log.last_txn_version(table, app_id):
            return  # already committed by a previous attempt — replay no-op
        delta_log.append(batch_df, table, txn=(app_id, batch_id))

    return (
        stream_df.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_iceberg_append_sink(
    stream_df: DataFrame,
    table: str,
    checkpoint_dir: str,
    app_id: str = "march_mania_spark_lakehouse_stream",
) -> StreamingQuery:
    """Exactly-once streaming append into an Iceberg-format table
    (`sources/iceberg.py`): each commit's snapshot summary carries
    (streaming-app-id, streaming-batch-id), and a replayed micro-batch
    is skipped when the metadata already holds its id — the same
    write-side idempotence as `start_delta_append_sink`, expressed with
    Iceberg's summary properties instead of SetTransaction actions.
    The first batch creates the table."""
    from march_mania_spark_lakehouse_spark.sources import iceberg

    def _append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= iceberg.last_streamed_batch(table, app_id):
            return  # already committed by a previous attempt
        props = {
            "streaming-app-id": app_id,
            "streaming-batch-id": str(batch_id),
        }
        if iceberg.current_version(table) is None:
            iceberg.create(batch_df, table, summary=props)
        else:
            iceberg.append(batch_df, table, summary=props)

    return (
        stream_df.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_iceberg_upsert_sink(
    stream_df: DataFrame,
    table: str,
    keys: "tuple[str, ...]",
    checkpoint_dir: str,
    app_id: str = "march_mania_spark_lakehouse_stream",
) -> StreamingQuery:
    """Exactly-once streaming CDC UPSERT into an Iceberg table — the
    Flink-upsert-sink shape on the merge-on-read idiom: each
    micro-batch writes an equality-delete of its keys followed by an
    append of its rows (`iceberg.upsert` ordering — the append's higher
    sequence number is what lets the new rows survive the tombstones).
    Write cost per batch is O(batch), never O(table); no read-side
    lookup, no data-file rewrite.

    Idempotence marker rides the APPEND (the batch's final commit), so
    a crash between tombstone and append replays the whole batch:
    re-tombstoning the same keys is semantically idempotent (the rows
    it would kill are already dead, and the duplicate tombstone's CDC
    decomposition emits nothing — rows alive at its parent matching
    the keys are none)."""
    from pyspark.sql import functions as F

    from march_mania_spark_lakehouse_spark.sources import iceberg

    def _upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= iceberg.last_streamed_batch(table, app_id):
            return  # already committed by a previous attempt
        props = {
            "streaming-app-id": app_id,
            "streaming-batch-id": str(batch_id),
        }
        spark = batch_df.sparkSession
        # a CDC batch can carry several versions of one key; keep the
        # batch's last writer per key (deterministic: max struct of the
        # remaining columns breaks ties identically everywhere)
        others = [c for c in batch_df.columns if c not in keys]
        latest = (
            batch_df.groupBy(*keys)
            .agg(F.max(F.struct(*others)).alias("__row"))
            .select(*keys, "__row.*")
        )
        if iceberg.current_version(table) is None:
            iceberg.create(latest, table, summary=props)
            return
        iceberg.delete_by_equality(
            spark, table, latest.select(*keys).distinct()
        )
        iceberg.append(latest, table, summary=props)

    return (
        stream_df.writeStream.foreachBatch(_upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
