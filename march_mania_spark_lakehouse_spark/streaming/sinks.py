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
