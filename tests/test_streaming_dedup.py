"""Streaming incremental corpus dedup (`streaming/dedup.py`): the
crawl-pipeline loop — micro-batches dedup against the persisted band
index, survivors append to a Delta corpus, exactly-once under
foreachBatch replays (Delta SetTransaction), including a crash landing
BETWEEN the corpus and index commits."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log
from march_mania_spark_lakehouse_spark.streaming.dedup import (
    process_dedup_batch,
    streaming_incremental_dedup,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
OTHER = "completely different vocabulary in this document body here now"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_streaming_loop_end_to_end(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)

    _docs(spark, [(1, BASE), (2, BASE + " ok"), (3, OTHER)]).coalesce(
        1
    ).write.mode("append").parquet(inbox)

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string").parquet(inbox)
        )
        q = streaming_incremental_dedup(
            spark, stream, corpus, index, ckpt
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    drain()
    got1 = {r.doc_id for r in delta_log.read_delta(spark, corpus).collect()}
    assert got1 == {1, 3}  # 2 is a near-dup of 1 (same-batch rule: min id wins)
    idx1 = delta_log.read_delta(spark, index)
    assert {r.doc_id for r in idx1.select("doc_id").distinct().collect()} == {1, 3}

    # batch 2: 4 duplicates the HISTORICAL survivor 1 (via the index,
    # text never re-read), 5 is genuinely new text
    fresh = "zebra quartz violin meadow seventeen lanterns beneath autumn rain"
    _docs(spark, [(4, BASE + " ok"), (5, fresh)]).coalesce(
        1
    ).write.mode("append").parquet(inbox)
    drain()
    got2 = {r.doc_id for r in delta_log.read_delta(spark, corpus).collect()}
    assert got2 == {1, 3, 5}
    # index grew by exactly the new survivor's rows
    assert {
        r.doc_id
        for r in delta_log.read_delta(spark, index).select("doc_id").distinct().collect()
    } == {1, 3, 5}

    # a THIRD drain with no new files is a no-op
    drain()
    assert delta_log.read_delta(spark, corpus).count() == len(got2)


def test_replay_and_partial_commit_idempotence(spark, tmp_path):
    corpus = str(tmp_path / "c2")
    index = str(tmp_path / "i2")
    b0 = _docs(spark, [(10, BASE), (11, OTHER)])
    assert process_dedup_batch(spark, b0, 0, corpus, index) == 2
    n_corpus = delta_log.read_delta(spark, corpus).count()
    n_index = delta_log.read_delta(spark, index).count()

    # full replay of batch 0: both tables untouched
    assert process_dedup_batch(spark, b0, 0, corpus, index) == 0
    assert delta_log.read_delta(spark, corpus).count() == n_corpus
    assert delta_log.read_delta(spark, index).count() == n_index

    # crash BETWEEN commits: batch 1's corpus append landed, the index
    # append didn't — replaying batch 1 completes ONLY the index
    b1 = _docs(spark, [(12, "crimson harbors echo beneath twelve wandering arctic lighthouse keepers")])
    from march_mania_spark_lakehouse_spark.operators import dedup as _dedup

    delta_log.append(b1, corpus, txn=("streaming_incremental_dedup", 1))
    process_dedup_batch(spark, b1, 1, corpus, index)
    got = {r.doc_id for r in delta_log.read_delta(spark, corpus).collect()}
    assert got == {10, 11, 12}  # no double-append of 12
    assert delta_log.read_delta(spark, corpus).filter(
        F.col("doc_id") == 12
    ).count() == 1
    idx_ids = {
        r.doc_id
        for r in delta_log.read_delta(spark, index).select("doc_id").distinct().collect()
    }
    assert idx_ids == {10, 11, 12}  # index caught up
    # batch 2 now dedups against EVERYTHING, including 12
    b2 = _docs(spark, [(13, "crimson harbors echo beneath twelve wandering arctic lighthouse keepers"), (14, "granite rivers hum seventeen golden procedural melodies tonight")])
    process_dedup_batch(spark, b2, 2, corpus, index)
    got = {r.doc_id for r in delta_log.read_delta(spark, corpus).collect()}
    assert 13 not in got and 14 in got


def test_index_partitioned_and_probe_prunes(spark, tmp_path):
    """Round 8: the persisted band index is partitioned by
    (band, pb = bh % index_buckets) and the per-batch probe plans only
    the touched partitions — `scan_partitions_any` must read strictly
    fewer files than the full index once buckets diverge."""
    corpus = str(tmp_path / "c3")
    index = str(tmp_path / "i3")
    rows = [
        (i, f"totally distinct body number {i} with words "
            + " ".join(f"tok{i}_{j}" for j in range(12)))
        for i in range(40)
    ]
    process_dedup_batch(spark, _docs(spark, rows), 0, corpus, index)
    assert delta_log.table_partition_columns(index) == ["band", "pb"]
    full = delta_log.read_delta(spark, index)
    n_all = len(full.inputFiles())
    assert n_all > 1  # partitioned layout: one file per touched bucket
    one = full.limit(1).collect()[0]
    probe = delta_log.scan_partitions_any(
        spark, index, [{"band": one["band"], "pb": one["pb"]}]
    )
    assert len(probe.inputFiles()) < n_all
    got = probe.select("band", "pb").distinct().collect()
    assert {(r["band"], r["pb"]) for r in got} == {(one["band"], one["pb"])}
    # second batch dedups against history through the pruned probe
    process_dedup_batch(
        spark, _docs(spark, [(100, rows[5][1]), (101, OTHER)]), 1, corpus, index
    )
    got2 = {r.doc_id for r in delta_log.read_delta(spark, corpus).collect()}
    assert 100 not in got2 and 101 in got2


def test_legacy_unpartitioned_index_still_works(spark, tmp_path):
    """A pre-round-8 index table (no pb column, unpartitioned) keeps
    deduping correctly — read whole, appended under its own schema."""
    from march_mania_spark_lakehouse_spark.operators import dedup as _d

    corpus = str(tmp_path / "c4")
    index = str(tmp_path / "i4")
    seed = _docs(spark, [(1, BASE)])
    delta_log.create(seed, corpus)
    delta_log.create(
        _d.minhash_band_index(seed, "doc_id", "text"), index
    )
    assert delta_log.table_partition_columns(index) == []
    process_dedup_batch(
        spark, _docs(spark, [(2, BASE + " ok"), (3, OTHER)]), 0, corpus, index
    )
    got = {r.doc_id for r in delta_log.read_delta(spark, corpus).collect()}
    assert got == {1, 3}  # 2 near-dups the HISTORY doc via the legacy index
    assert "pb" not in delta_log.read_delta(spark, index).columns


def test_index_bucket_grid_recorded_and_mismatch_overridden(spark, tmp_path):
    """The bucket count is baked into the index table's layout, so it
    is recorded in the Delta configuration at create and OVERRIDES a
    mismatched caller value — probing a 16-bucket grid with mod-32
    keys would silently prune away real collisions and re-admit
    near-duplicates."""
    corpus = str(tmp_path / "c5")
    index = str(tmp_path / "i5")
    process_dedup_batch(
        spark, _docs(spark, [(1, BASE)]), 0, corpus, index, index_buckets=16
    )
    meta = delta_log._latest_metadata(index, delta_log.latest_version(index))
    assert meta["configuration"]["streamingDedup.indexBuckets"] == "16"
    # caller passes the (wrong) default 32; the recorded 16 wins and
    # the historical near-dup is still caught through the pruned probe
    process_dedup_batch(
        spark, _docs(spark, [(2, BASE + " ok"), (3, OTHER)]), 1, corpus, index
    )
    got = {r.doc_id for r in delta_log.read_delta(spark, corpus).collect()}
    assert got == {1, 3}
    # and the index delta landed on the 16-bucket grid
    assert delta_log.read_delta(spark, index).filter("pb >= 16").count() == 0
