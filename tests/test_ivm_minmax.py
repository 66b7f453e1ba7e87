"""`ivm.refresh_minmax` (round 11): min/max maintenance through
delete-carrying feeds via the dirty-group rule — only groups whose
deleted values touch the base extreme re-scan the current table; every
other group refreshes from state alone. Pinned against full recomputes
and, structurally, against the rescan actually being pruned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.operators import ivm


def _state_rows(state):
    return sorted(
        (r[0], r.n, float(r.sum_dec), r.min_m, r.max_m)
        for r in state.collect()
    )


def _recompute(spark, rows):
    df = spark.createDataFrame(rows, "k string, v double")
    return _state_rows(ivm.agg_state(df, ["k"], "v"))


def _feed(spark, rows):
    return spark.createDataFrame(rows, "k string, v double, _change_type string")


def test_refresh_matches_recompute_across_delete_shapes(spark):
    base_rows = [
        ("a", 1.0), ("a", 5.0), ("a", 9.0),
        ("b", 2.0), ("b", 7.0),
        ("c", 3.0),
        ("d", 4.0), ("d", 4.0),  # tied extremes
    ]
    base = ivm.agg_state(
        spark.createDataFrame(base_rows, "k string, v double"), ["k"], "v"
    )
    changes = [
        ("a", 5.0, "delete"),            # interior delete: NOT dirty
        ("b", 7.0, "delete"),            # max delete: dirty, rescan
        ("b", 11.0, "insert"),
        ("c", 3.0, "delete"),            # group retracts to zero
        ("d", 4.0, "delete"),            # tied extreme: dirty, twin stays
        ("e", 6.0, "insert"),            # brand-new group
        ("a", 1.0, "update_preimage"),   # min update: dirty
        ("a", 0.5, "update_postimage"),
    ]
    final_rows = [
        ("a", 0.5), ("a", 9.0),
        ("b", 2.0), ("b", 11.0),
        ("d", 4.0),
        ("e", 6.0),
    ]
    current = spark.createDataFrame(final_rows, "k string, v double")
    got = _state_rows(
        ivm.refresh_minmax(base, _feed(spark, changes), ["k"], "v", current)
    )
    assert got == _recompute(spark, final_rows)


def test_clean_groups_never_scan_current(spark):
    """Structural pruning check: when NO delete touches an extreme, the
    refresh must not read `current` at all — the rescan side is an
    empty semi-join, so feeding a poisoned `current` (wrong values)
    must not change the result."""
    base = ivm.agg_state(
        spark.createDataFrame(
            [("a", 1.0), ("a", 9.0), ("b", 5.0)], "k string, v double"
        ),
        ["k"], "v",
    )
    changes = [
        ("a", 4.0, "delete"),   # interior: clean
        ("a", 12.0, "insert"),  # insert extends max monotonically
    ]
    poisoned = spark.createDataFrame(
        [("a", -999.0), ("b", 999.0)], "k string, v double"
    )
    got = _state_rows(
        ivm.refresh_minmax(base, _feed(spark, changes), ["k"], "v", poisoned)
    )
    assert got == [
        ("a", 2, 18.0, 1.0, 12.0),
        ("b", 1, 5.0, 5.0, 5.0),
    ]


def test_refresh_minmax_over_lineage_diff(spark, tmp_path):
    """End-to-end with the lake layer: base state at the first
    snapshot + the snapshot-diff feed (DV delete of a group MIN +
    carried update + append) == full recompute of the head, min/max
    included."""
    from march_mania_spark_lakehouse_spark.sources import iceberg

    t = str(tmp_path / "ice")
    rows = [(i, i % 4, float(i)) for i in range(24)]
    iceberg.create(
        spark.createDataFrame(rows, "id long, k long, val double")
        .repartitionByRange(2, "id"),
        t,
        format_version=3,
    )
    s1 = iceberg.current_metadata(t)["current-snapshot-id"]
    base = ivm.agg_state(
        iceberg.read_iceberg(spark, t).select("k", "val"), ["k"], "val"
    ).localCheckpoint()
    iceberg.delete_where(spark, t, "id < 4")   # each group's min goes
    iceberg.update_where(spark, t, "id = 23", {"val": "val + 100.0"})
    iceberg.append(
        spark.createDataFrame([(100, 1, -5.0)], "id long, k long, val double"),
        t,
    )
    feed = iceberg.snapshot_diff_changelog(spark, t, s1).select(
        "k", "val", "_change_type"
    )
    current = iceberg.read_iceberg(spark, t).select("k", "val")
    got = sorted(
        tuple(r)
        for r in ivm.finalize_state(
            ivm.refresh_minmax(base, feed, ["k"], "val", current)
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivm.finalize_state(
            ivm.agg_state(current, ["k"], "val")
        ).collect()
    )
    assert got == want and got


def test_streaming_minmax_materialized_view(spark, tmp_path):
    """The streaming gold-table loop with NON-INVERTIBLE aggregates:
    a Delta CDC stream feeds `refresh_minmax` in foreachBatch, state
    persisted between micro-batches — after deletes that remove group
    extremes, the maintained view equals a full recompute. (Each drain
    runs while the source head equals the batch end, so the dirty-group
    rescan sees consistent state — the production form would pin the
    rescan to the batch's end version via time travel.)"""
    from march_mania_spark_lakehouse_spark.sources import delta_log
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        DeltaTableCdcStreamDataSource,
    )

    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = [(i, i % 3, float(i)) for i in range(18)]
    delta_log.create(
        spark.createDataFrame(rows, "id long, k long, v double"), src
    )
    spark.dataSource.register(DeltaTableCdcStreamDataSource)
    # seed: empty state with the right schema
    ivm.agg_state(
        delta_log.read_delta(spark, src).select("k", "v").limit(0),
        ["k"], "v",
    ).write.mode("overwrite").parquet(state_dir)

    def apply_batch(batch, _bid):
        base = spark.read.parquet(state_dir)
        cur = delta_log.read_delta(spark, src).select("k", "v")
        new_state = ivm.refresh_minmax(
            base, batch.select("k", "v", "_change_type"), ["k"], "v", cur
        ).localCheckpoint()
        new_state.write.mode("overwrite").parquet(state_dir)

    def drain():
        q = (
            spark.readStream.format("delta_table_cdc")
            .option("path", src).load()
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    delta_log.delete_where(spark, src, "v >= 15.0")  # group maxes go
    drain()
    delta_log.append(
        spark.createDataFrame([(100, 0, -7.0)], "id long, k long, v double"),
        src,
    )
    delta_log.delete_where(spark, src, "id % 3 = 1")
    drain()
    got = sorted(
        tuple(r)
        for r in ivm.finalize_state(spark.read.parquet(state_dir)).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivm.finalize_state(
            ivm.agg_state(
                delta_log.read_delta(spark, src).select("k", "v"),
                ["k"], "v",
            )
        ).collect()
    )
    assert got == want and got
