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
