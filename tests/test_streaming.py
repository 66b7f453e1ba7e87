"""Structured Streaming: the tumbling-window wrapper must produce the
same results as the batch plan when fed the same events through a file
stream (availableNow → memory sink)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

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


def test_stream_stream_interval_join_matches_batch_range_join(spark, sf_dir, tmp_path):
    """Stream–stream join with event-time bounds must produce the same
    pairs as the batch range join over the same data."""
    from pyspark.sql import functions as F

    from march_mania_spark_lakehouse_spark.operators import temporal

    ev = catalog.load(spark, "events", sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_event_id")
    )
    e_src, c_src = str(tmp_path / "errs"), str(tmp_path / "clicks")
    errors.write.mode("overwrite").parquet(e_src)
    clicks.write.mode("overwrite").parquet(c_src)

    l_stream = spark.readStream.schema(errors.schema).parquet(e_src)
    r_stream = spark.readStream.schema(clicks.schema).parquet(c_src)
    joined = ev_ops.stream_stream_interval_join(
        l_stream, r_stream, lower_s=-3600, upper_s=0, watermark="100 hours"
    )

    sink = f"ssj_sink_{uuid.uuid4().hex[:8]}"
    q = (
        joined.select("event_id", "r_event_id")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }

    batch = {
        (r["event_id"], r["r_event_id"])
        for r in temporal.range_join(
            errors, clicks, on=["user_id"], left_ts="ts", right_ts="r_ts",
            lower_s=-3600, upper_s=0,
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_tws_dedup_stream_exactly_once_across_microbatches(spark, sf_dir, tmp_path):
    """transformWithStateInPandas dedup: a stream that delivers every
    event twice (two files → two micro-batches) must emit each event_id
    exactly once, with the full original row."""
    # Real protobuf when installed, vendored miniproto shim otherwise
    # (session.get_spark activated it before the JVM started).
    from march_mania_spark_lakehouse_spark.vendor import ensure_protobuf

    ensure_protobuf()
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )
    from pyspark.sql import functions as F

    from march_mania_spark_lakehouse_spark.streaming import tws

    # transformWithStateInPandas needs a state store with column-family
    # support: RocksDB (bundled with Spark), not the HDFS-backed default.
    # Same conf a production TWS job sets; runtime-settable per session.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = catalog.load(spark, "events", sf_dir).filter(F.col("event_id") < 500)
        src = str(tmp_path / "dup_src")
        events.coalesce(1).write.mode("overwrite").parquet(src)
        events.coalesce(1).write.mode("append").parquet(src)  # replay: every id twice

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = tws.dedup_stream(stream, key_cols=("event_id",))

        sink = f"tws_sink_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert len(q.recentProgress) > 1, "expected multiple micro-batches"

        got = spark.sql(f"SELECT * FROM {sink}")
        n_expected = events.count()
        assert got.count() == n_expected  # each id exactly once
        assert got.select("event_id").distinct().count() == n_expected
        # surviving rows are real input rows (spot-check the value column)
        expect_vals = {r["event_id"]: r["value"] for r in events.collect()}
        for r in got.collect():
            assert abs(r["value"] - expect_vals[r["event_id"]]) < 1e-12
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_profile_stream_all_state_kinds_match_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas with ValueState + ListState + MapState
    in one processor: after streaming events in two micro-batches, the
    latest emitted profile per user must equal the batch groupBy answer
    (count, sum, distinct event types), and the recent-buffer must be
    bounded at keep_recent."""
    from march_mania_spark_lakehouse_spark.vendor import ensure_protobuf

    ensure_protobuf()
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )
    from pyspark.sql import functions as F

    from march_mania_spark_lakehouse_spark.streaming import tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = catalog.load(spark, "events", sf_dir).filter(F.col("user_id") < 40)
        src = str(tmp_path / "profile_src")
        half_a = events.filter(F.col("event_id") % 2 == 0)
        half_b = events.filter(F.col("event_id") % 2 == 1)
        half_a.coalesce(1).write.mode("overwrite").parquet(src)
        half_b.coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = tws.profile_stream(stream, key_col="user_id", keep_recent=5)

        sink = f"tws_profile_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert len(q.recentProgress) > 1, "expected multiple micro-batches"

        # latest (cumulative) emission per user = the one with max n_events
        emitted = spark.sql(f"SELECT * FROM {sink}").collect()
        latest: dict[int, tuple] = {}
        for r in emitted:
            if r["user_id"] not in latest or r["n_events"] > latest[r["user_id"]][0]:
                latest[r["user_id"]] = (
                    r["n_events"],
                    r["total_value"],
                    r["n_recent"],
                    r["n_types"],
                )
        expect = {
            r["user_id"]: (r["n"], r["total"], r["n_types"])
            for r in events.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("total"),
                F.countDistinct("event_type").alias("n_types"),
            )
            .collect()
        }
        assert set(latest) == set(expect)
        for uid, (n, total, n_recent, n_types) in latest.items():
            en, etotal, etypes = expect[uid]
            assert n == en, f"user {uid}: count {n} != {en}"
            assert abs(total - etotal) < 1e-6 * max(1.0, abs(etotal))
            assert n_types == etypes
            assert n_recent == min(n, 5)  # ListState buffer bounded
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_idle_timeout_sessions_close_via_timers(spark, sf_dir, tmp_path):
    """Processing-time timers: a key's session closes (emits + evicts
    state) one idle timeout after its last arrival, inside
    handleExpiredTimer. Every closed session must equal the batch
    aggregate for its key. Timer-driven emission means micro-batches
    keep coming after the data is drained, so the test polls the sink
    and stops the query itself instead of awaiting termination."""
    import time as _time

    from march_mania_spark_lakehouse_spark.vendor import ensure_protobuf

    ensure_protobuf()
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )
    from pyspark.sql import functions as F

    from march_mania_spark_lakehouse_spark.streaming import tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = catalog.load(spark, "events", sf_dir).filter(F.col("user_id") < 30)
        src = str(tmp_path / "timer_src")
        events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = tws.idle_timeout_sessions(stream, key_col="user_id", timeout_ms=1)

        sink = f"tws_timer_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        expect = {
            r["user_id"]: (r["n"], r["t"])
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
            .collect()
        }
        try:
            deadline = _time.time() + 120
            emitted: list = []
            while _time.time() < deadline:
                emitted = spark.sql(f"SELECT * FROM {sink}").collect()
                if {r["user_id"] for r in emitted} == set(expect) or not q.isActive:
                    break
                _time.sleep(0.5)
        finally:
            q.stop()

        assert {r["user_id"] for r in emitted} == set(expect)
        assert len(emitted) == len(expect)  # exactly one close per key
        for r in emitted:
            n, t = expect[r["user_id"]]
            assert r["n_events"] == n
            assert abs(r["total_value"] - t) < 1e-6 * max(1.0, abs(t))
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_dedup_within_watermark_suppresses_redelivery(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: a stream that delivers every event
    twice (two identical files) must come out with each event_id once."""
    batch_events = catalog.load(spark, "events", sf_dir).limit(200)
    src = str(tmp_path / "dedup_src")
    batch_events.coalesce(1).write.mode("overwrite").parquet(src)
    batch_events.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(batch_events.schema).parquet(src)
    deduped = ev_ops.dedup_within_watermark(stream, ("event_id",), "ts", "10 hours")

    sink = f"dedup_sink_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    ids = [r.event_id for r in spark.sql(f"SELECT event_id FROM {sink}").collect()]
    assert len(ids) == len(set(ids)), "duplicate event_ids survived dedup"
    assert set(ids) == {r.event_id for r in batch_events.collect()}


def test_stream_static_enrich_matches_batch_join(spark, sf_dir, tmp_path):
    """Stream-static broadcast enrichment must produce exactly the batch
    join's rows, with no watermark/state requirements."""
    ev = catalog.load(spark, "events", sf_dir).select("event_id", "user_id", "value")
    dim = (
        ev.select("user_id").distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std"))
    )
    src = str(tmp_path / "enrich_src")
    ev.limit(300).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    enriched = ev_ops.stream_static_enrich(stream, dim, "user_id")

    sink = f"enrich_sink_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    got = {
        (r.event_id, r.tier)
        for r in spark.sql(f"SELECT event_id, tier FROM {sink}").collect()
    }
    expect = {
        (r.event_id, r.tier)
        for r in spark.read.parquet(src).join(dim, "user_id", "left").collect()
    }
    assert got == expect


def test_streaming_session_window_matches_batch(spark, sf_dir, tmp_path):
    """Streaming session_window must emit exactly the batch sessions for
    every session the final watermark closed; sessions still open at
    end-of-stream legitimately remain in state (append-mode contract),
    so the comparison is: streamed ⊆ batch, and every batch session that
    closed before the final watermark was streamed."""
    batch_events = catalog.load(spark, "events", sf_dir)
    src = str(tmp_path / "session_src")
    # multiple files → several micro-batches; sessions must merge across
    batch_events.repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch_events.schema).parquet(src)
    agg = ev_ops.streaming_session_agg(stream, gap="30 minutes", watermark="1 second")

    sink = f"session_sink_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    streamed = {
        (r.session_start, r.session_end, r.user_id): (r.n_events, r.sum_value)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    batch = {
        (r.session_start, r.session_end, r.user_id): (r.n_events, r.sum_value)
        for r in ev_ops.session_agg(batch_events, gap="30 minutes").collect()
    }
    assert streamed, "no sessions emitted"
    # every emitted session is bit-identical to its batch counterpart
    for k, v in streamed.items():
        assert batch[k] == v, k
    # and the only batch sessions missing are the end-of-stream tail the
    # watermark never closed
    max_ts = batch_events.agg(F.max("ts")).first()[0]
    import datetime
    horizon = max_ts - datetime.timedelta(seconds=1) - datetime.timedelta(minutes=30)
    missing = {k for k in batch if k not in streamed}
    assert all(k[1] > horizon for k in missing), sorted(missing)[:5]


def test_streaming_restart_from_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Recovery contract: a file-source → file-sink query with a
    checkpointLocation, stopped and restarted after new data arrives,
    must emit every input row exactly once across both runs (offsets
    replay from the WAL; the sink's _spark_metadata commits are
    idempotent). This is the property that makes a 100 TB ingest
    restartable mid-day."""
    from pyspark.sql import functions as F

    events = catalog.load(spark, "events", sf_dir).limit(400)
    src = str(tmp_path / "restart_src")
    sink = str(tmp_path / "restart_sink")
    ckpt = str(tmp_path / "restart_ckpt")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        enriched = stream.select(
            "event_id", "user_id", (F.col("value") * 2).alias("doubled")
        )
        q = (
            enriched.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first == first.count()

    second.coalesce(1).write.mode("append").parquet(src)
    run_once()  # restart: same checkpoint, must pick up ONLY the new file

    out = spark.read.parquet(sink)
    assert out.count() == events.count()  # nothing duplicated, nothing lost
    assert out.select("event_id").distinct().count() == events.count()
    # values really came through the transformation
    sample = {r["event_id"]: r["doubled"] for r in out.limit(50).collect()}
    expect = {
        r["event_id"]: r["value"] * 2
        for r in events.filter(F.col("event_id").isin(*sample.keys())).collect()
    }
    for k, v in sample.items():
        assert abs(v - expect[k]) < 1e-9


def test_tws_event_time_sessions_close_by_watermark(spark, sf_dir, tmp_path):
    """Event-time TWS timers: a session closes iff the final watermark
    (max event ts, delay 0) passed its last-event + gap — decided by
    the data's clock, so the closed set is exactly predictable; closed
    sessions carry full batch-aggregate counts, and availableNow
    terminates (unlike processing-time timers, event-time timers can't
    fire without data advancing the watermark)."""
    from march_mania_spark_lakehouse_spark.vendor import ensure_protobuf

    ensure_protobuf()
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )
    from march_mania_spark_lakehouse_spark.streaming import tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        gap_ms = 3_600_000
        events = catalog.load(spark, "events", sf_dir).filter(F.col("user_id") < 30)
        cut = events.selectExpr("percentile(cast(ts as double), 0.6) p").first()["p"]
        src = str(tmp_path / "et_src")
        events.filter(F.col("ts").cast("double") <= cut).coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        events.filter(F.col("ts").cast("double") > cut).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = tws.event_time_sessions(stream, gap_ms=gap_ms)
        sink = f"tws_et_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "event-time query must self-terminate"
        emitted = {r["user_id"]: r for r in spark.sql(f"SELECT * FROM {sink}").collect()}

        stats = {
            r["user_id"]: (r["n"], r["t"], int(r["m"].timestamp() * 1000))
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("t"), F.max("ts").alias("m"))
            .collect()
        }
        wm_ms = max(m for (_, _, m) in stats.values())
        expected_closed = {u for u, (_, _, m) in stats.items() if m + gap_ms < wm_ms}
        assert set(emitted) == expected_closed
        assert len(expected_closed) < len(stats)  # the max-ts user stays open
        for u in expected_closed:
            n, t, m = stats[u]
            assert emitted[u]["n_events"] == n
            assert abs(emitted[u]["total_value"] - t) < 1e-6 * max(1.0, abs(t))
            assert emitted[u]["last_event_ms"] == m
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_stream_left_outer_join_flushes_unmatched(spark, tmp_path):
    """leftOuter stream–stream interval join: matched rows emit like the
    inner join, unmatched left rows emit with nulls once the GLOBAL
    watermark (the MIN over both inputs) passes their match window.
    Late sentinels on BOTH sides advance the global watermark past
    every real row's window, so availableNow's final no-data batch
    deterministically flushes all unmatched rows."""
    from pyspark.sql import functions as F

    lrows = [(i, f"2024-01-01 00:0{i}:00") for i in range(6)]
    rrows = [(i, f"2024-01-01 00:0{i}:30") for i in range(0, 6, 2)]
    l_sent = [(98, "2024-01-01 06:00:00")]   # advances LEFT watermark
    r_sent = [(99, "2024-01-01 06:00:00")]   # advances RIGHT watermark
    ldf = spark.createDataFrame(lrows + l_sent, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    rdf = spark.createDataFrame(rrows + r_sent, "user_id long, r_ts string").withColumn(
        "r_ts", F.col("r_ts").cast("timestamp")
    )
    l_src, r_src = str(tmp_path / "lo_l"), str(tmp_path / "lo_r")
    ldf.write.parquet(l_src)
    rdf.write.parquet(r_src)

    joined = ev_ops.stream_stream_interval_join(
        spark.readStream.schema(ldf.schema).parquet(l_src),
        spark.readStream.schema(rdf.schema).parquet(r_src),
        key="user_id", left_ts="ts", right_ts="r_ts",
        lower_s=0, upper_s=120, watermark="1 minute", how="leftOuter",
    )
    sink = f"ssoj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.r_ts is None)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
        if r.user_id < 90  # sentinels' own windows never close — excluded
    }
    # evens matched inside [ts, ts+2min); odds flush as unmatched
    want = {(i, i % 2 == 1) for i in range(6)}
    assert got == want


def test_stream_stream_full_outer_join_flushes_both_sides(spark, tmp_path):
    """fullOuter stream–stream interval join: unmatched rows from BOTH
    sides flush with nulls once the global watermark passes their
    windows (same sentinel construction as the leftOuter test)."""
    from pyspark.sql import functions as F

    lrows = [(i, f"2024-01-01 00:0{i}:00") for i in range(4)]       # 0..3
    rrows = [(i, f"2024-01-01 00:0{i}:30") for i in (0, 2)]         # match 0,2
    rrows += [(7, "2024-01-01 00:03:30")]                           # right-only
    l_sent = [(98, "2024-01-01 06:00:00")]
    r_sent = [(99, "2024-01-01 06:00:00")]
    ldf = spark.createDataFrame(lrows + l_sent, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    rdf = spark.createDataFrame(rrows + r_sent, "r_user long, r_ts string").withColumn(
        "r_ts", F.col("r_ts").cast("timestamp")
    )
    l_src, r_src = str(tmp_path / "fo_l"), str(tmp_path / "fo_r")
    ldf.write.parquet(l_src)
    rdf.write.parquet(r_src)

    ls = spark.readStream.schema(ldf.schema).parquet(l_src).withWatermark("ts", "1 minute")
    rs = spark.readStream.schema(rdf.schema).parquet(r_src).withWatermark("r_ts", "1 minute")
    cond = F.expr(
        "user_id = r_user AND r_ts >= ts AND r_ts < ts + INTERVAL 2 MINUTE"
    )
    joined = ls.join(rs, cond, "fullOuter")
    sink = f"ssfo_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.r_user)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
        if (r.user_id is None or r.user_id < 90)
        and (r.r_user is None or r.r_user < 90)
    }
    want = {
        (0, 0), (2, 2),            # matched
        (1, None), (3, None),      # left-only flushes
        (None, 7),                 # right-only flush
    }
    assert got == want
