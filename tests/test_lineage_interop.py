"""Cross-format ROW-ID carry (round-10): a row's ``_row_id`` is
IDENTICAL on both sides of every conversion and sync — Delta
``baseRowId`` ⇄ Iceberg entry ``first_row_id`` (same base+position
model in both public specs), high-water mark ⇄ ``next-row-id``, and
materialized id columns share one physical name so shared data files
carry ONE id column both lineage readers consume. Version clocks
(``_row_commit_version`` vs ``_last_updated_sequence_number``) are
format-local and deliberately do not transfer."""

from __future__ import annotations

import pytest

from march_mania_spark_lakehouse_spark.sources import delta_log as dl
from march_mania_spark_lakehouse_spark.sources import iceberg


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(lo, hi):
    return [(i, i % 5, float(i)) for i in range(lo, hi)]


def _delta_ids(spark, dt):
    return {
        r.id: r._row_id for r in dl.read_delta_lineage(spark, dt).collect()
    }


def _ice_ids(spark, it):
    return {
        r.id: r._row_id for r in iceberg.read_lineage(spark, it).collect()
    }


def test_delta_to_iceberg_conversion_carries_row_ids(spark, tmp_path):
    dt = str(tmp_path / "delta_src")
    it = str(tmp_path / "ice_dst")
    dl.create(
        _df(spark, _rows(0, 40)).repartitionByRange(3, "id"),
        dt,
        row_tracking=True,
    )
    dl.delete_where(spark, dt, "k = 1")
    dl.update_where(spark, dt, "id % 4 = 0", {"val": "val + 100.0"})
    want = _delta_ids(spark, dt)
    iceberg.convert_from_delta(dt, it)
    assert _ice_ids(spark, it) == want  # identical ids, both engines
    meta = iceberg.current_metadata(it)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == dl._row_id_high_water_mark(
        dt, dl.latest_version(dt)
    ) + 1
    # the Iceberg side keeps allocating ABOVE the carried ids
    iceberg.append(_df(spark, _rows(100, 103)), it)
    ids = _ice_ids(spark, it)
    assert len(set(ids.values())) == len(ids)  # still unique


def test_iceberg_to_delta_conversion_carries_row_ids(spark, tmp_path):
    it = str(tmp_path / "ice_src")
    dt = str(tmp_path / "delta_dst")
    iceberg.create(
        _df(spark, _rows(0, 40)).repartitionByRange(3, "id"),
        it,
        format_version=3,
    )
    iceberg.delete_where(spark, it, "k = 2")
    iceberg.update_where(
        spark, it, "id % 4 = 1",
        {"val": "val + 100.0"},
    )
    want = _ice_ids(spark, it)
    iceberg.convert_to_delta(it, dt)
    assert _delta_ids(spark, dt) == want
    # the mirror declares row tracking and its mark follows the source
    proto = dl._effective_protocol(dt, 0)
    assert "rowTracking" in proto["writerFeatures"]
    assert dl._row_id_high_water_mark(dt, 0) == (
        iceberg.current_metadata(it)["next-row-id"] - 1
    )
    # the Delta side keeps allocating above the carried ids
    dl.append(_df(spark, _rows(100, 103)), dt)
    ids = _delta_ids(spark, dt)
    assert len(set(ids.values())) == len(ids)


def test_forward_sync_keeps_row_ids_identical(spark, tmp_path):
    dt = str(tmp_path / "delta_src")
    it = str(tmp_path / "ice_mirror")
    dl.create(
        _df(spark, _rows(0, 30)).repartitionByRange(2, "id"),
        dt,
        row_tracking=True,
    )
    iceberg.convert_from_delta(dt, it)
    dl.append(_df(spark, _rows(30, 40)), dt)
    dl.delete_where(spark, dt, "k = 3")
    dl.update_where(spark, dt, "id % 6 = 0", {"val": "val + 1.0"})
    iceberg.sync_from_delta(dt, it)
    assert _ice_ids(spark, it) == _delta_ids(spark, dt)
    assert iceberg.current_metadata(it)["next-row-id"] == (
        dl._row_id_high_water_mark(dt, dl.latest_version(dt)) + 1
    )


def test_reverse_sync_keeps_row_ids_identical(spark, tmp_path):
    it = str(tmp_path / "ice_src")
    dt = str(tmp_path / "delta_mirror")
    iceberg.create(
        _df(spark, _rows(0, 30)).repartitionByRange(2, "id"),
        it,
        format_version=3,
    )
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, _rows(30, 40)), it)
    iceberg.delete_where(spark, it, "k = 4")
    iceberg.update_where(spark, it, "id % 6 = 1", {"val": "val + 1.0"})
    iceberg.sync_to_delta(it, dt)
    assert _delta_ids(spark, dt) == _ice_ids(spark, it)


def test_untracked_sources_convert_without_lineage(spark, tmp_path):
    """No row tracking on the source → the conversion stays plain (no
    rowTracking feature, no v3 upgrade for a DV-less source)."""
    dt = str(tmp_path / "plain_delta")
    it = str(tmp_path / "plain_ice")
    dl.create(_df(spark, _rows(0, 10)), dt)
    iceberg.convert_from_delta(dt, it)
    meta = iceberg.current_metadata(it)
    assert meta["format-version"] == 2
    assert "next-row-id" not in meta
    it2 = str(tmp_path / "plain_ice2")
    dt2 = str(tmp_path / "plain_delta2")
    iceberg.create(_df(spark, _rows(0, 10)), it2)  # v2: no lineage
    iceberg.convert_to_delta(it2, dt2)
    proto = dl._effective_protocol(dt2, 0)
    assert "rowTracking" not in (proto.get("writerFeatures") or [])
    with pytest.raises(ValueError):
        dl.read_delta_lineage(spark, dt2)
