"""Structured Streaming: the tumbling-window wrapper must produce the
same results as the batch plan when fed the same events through a file
stream (availableNow → memory sink)."""

from __future__ import annotations

import uuid

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.streaming import events as ev_ops


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    batch_events = catalog.load(spark, "events", sf_dir)
    src = str(tmp_path / "stream_src")
    batch_events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch_events.schema).parquet(src)
    agg = ev_ops.streaming_tumbling_agg(stream, "1 hour", watermark="10 hours")

    sink = f"stream_sink_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    batch = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in ev_ops.tumbling_agg(batch_events, "1 hour").collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_stateful_running_totals_accumulate_across_microbatches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: state must carry across micro-batches —
    after draining a multi-file stream one file per trigger, the last
    update per key equals the batch groupBy totals."""
    from pyspark.sql import functions as F

    from march_mania_spark_lakehouse_spark.streaming import stateful

    batch_events = catalog.load(spark, "events", sf_dir)
    src = str(tmp_path / "stateful_src")
    # 4 files → 4 micro-batches with maxFilesPerTrigger=1.
    batch_events.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.running_totals_stream(stream)

    sink = f"stateful_sink_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) > 1, "expected multiple micro-batches"

    # Memory sink appends every update; the per-key max n_events row is
    # the final state (n_events is monotonically increasing).
    final = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(
            f"""SELECT event_type, n_events, sum_value FROM (
                  SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY event_type ORDER BY n_events DESC) rn
                  FROM {sink}) WHERE rn = 1"""
        ).collect()
    }
    expected = {
        r["event_type"]: (r["n"], r["s"])
        for r in batch_events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(expected)
    for k, (n, s) in expected.items():
        assert final[k][0] == n
        assert abs(final[k][1] - s) < 1e-6
