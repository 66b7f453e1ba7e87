"""Iceberg v3 ROW LINEAGE (round-10): ``_row_id`` and
``_last_updated_sequence_number`` per the v3 spec's model — appends
assign ids from the table's ``next-row-id`` via entry-level
``first_row_id`` inheritance (one manifest long per file, never data
bytes), deletes leave survivors' ids untouched, compaction MATERIALIZES
the ids into the rewritten parquet (position changes, ids don't), and
`update_where` carries the id through the delete+append pair while the
new entry's sequence bumps ``_last_updated_sequence_number``. Every
parity is pinned through the clean-room independent reader's own
lineage decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import iceberg
from tests import iceberg_reader_independent as indep


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(lo, hi):
    return [(i, i % 5, float(i)) for i in range(lo, hi)]


def _lineage(spark, table):
    """{id: (_row_id, _lus)} from the ENGINE, asserted equal to the
    independent reader's own decode first."""
    eng = {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in iceberg.read_lineage(spark, table).collect()
    }
    ind = {
        row[0]: (row[-2], row[-1])
        for row in indep.read_rows(table, with_lineage=True)
    }
    assert eng == ind
    return eng


def test_appends_assign_unique_stable_ids(spark, table):
    iceberg.create(
        _df(spark, _rows(0, 30)).repartitionByRange(3, "id"),
        table,
        format_version=3,
    )
    iceberg.append(_df(spark, _rows(30, 40)), table)
    lin = _lineage(spark, table)
    rids = sorted(rid for rid, _ in lin.values())
    assert rids == list(range(40))  # dense, unique, zero-based
    assert {lus for _, lus in lin.values()} == {1, 2}
    meta = iceberg.current_metadata(table)
    assert meta["next-row-id"] == 40
    assert [s.get("first-row-id") for s in meta["snapshots"]] == [0, 30]
    # ids are stable: re-reading yields the identical assignment
    assert _lineage(spark, table) == lin


def test_dv_delete_preserves_survivor_ids(spark, table):
    iceberg.create(
        _df(spark, _rows(0, 30)).repartitionByRange(3, "id"),
        table,
        format_version=3,
    )
    before = _lineage(spark, table)
    iceberg.delete_where(spark, table, "k = 2")
    after = _lineage(spark, table)
    assert set(after) == {i for i in range(30) if i % 5 != 2}
    assert all(after[i] == before[i] for i in after)
    # deletes consume no row ids
    assert iceberg.current_metadata(table)["next-row-id"] == 30


def test_compaction_materializes_and_preserves(spark, table):
    iceberg.create(
        _df(spark, _rows(0, 30)).repartitionByRange(3, "id"),
        table,
        format_version=3,
    )
    iceberg.delete_where(spark, table, "id < 5")
    before = _lineage(spark, table)
    iceberg.optimize(spark, table, small_file_bytes=1 << 30)
    assert _lineage(spark, table) == before
    # the packed files carry MATERIALIZED lineage columns and their
    # entries are lineage-free (inherit-or-materialize, never both)
    import pyarrow.parquet as pq

    meta = iceberg.current_metadata(table)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    from march_mania_spark_lakehouse_spark.sources import avro_ocf

    packed = 0
    for m in avro_ocf.read_ocf(snap["manifest-list"]):
        if m.get("content", 0) != 0:
            continue
        for e in avro_ocf.read_ocf(m["manifest_path"]):
            if e["status"] == 1 and e["data_file"].get("content", 0) == 0:
                names = pq.ParquetFile(
                    e["data_file"]["file_path"]
                ).schema_arrow.names
                assert "_row_id" in names
                assert "_last_updated_sequence_number" in names
                assert e["data_file"].get("first_row_id") is None
                packed += 1
    assert packed >= 1
    # full compact() preserves too, and next-row-id never moved
    iceberg.compact(spark, table)
    assert _lineage(spark, table) == before
    assert iceberg.current_metadata(table)["next-row-id"] == 30


def test_update_where_carries_id_and_bumps_lus(spark, table):
    iceberg.create(
        _df(spark, _rows(0, 20)).repartitionByRange(2, "id"),
        table,
        format_version=3,
    )
    before = _lineage(spark, table)
    iceberg.update_where(
        spark, table, "id % 4 = 0", {"val": F.col("val") + 100.0}
    )
    after = _lineage(spark, table)
    head_seq = iceberg.current_metadata(table)["last-sequence-number"]
    for i in range(20):
        rid, lus = after[i]
        assert rid == before[i][0]  # same row identity through UPDATE
        if i % 4 == 0:
            assert lus == head_seq  # updated: bumped to the new commit
        else:
            assert lus == before[i][1]  # untouched
    # the updated images did not consume fresh row ids
    assert iceberg.current_metadata(table)["next-row-id"] == 20
    # a second update composes (carry survives its own carry)
    iceberg.update_where(
        spark, table, "id = 0", {"val": F.lit(-1.0)}
    )
    again = _lineage(spark, table)
    assert again[0][0] == before[0][0]
    assert again[0][1] == iceberg.current_metadata(table)["last-sequence-number"]


def test_upgrade_leaves_old_files_null_new_files_assigned(spark, table):
    iceberg.create(_df(spark, _rows(0, 10)), table)  # v2
    iceberg.upgrade_format_version(table, 3)
    iceberg.append(_df(spark, _rows(10, 15)), table)
    lin = _lineage(spark, table)
    assert all(lin[i] == (None, None) for i in range(10))  # honest nulls
    assert sorted(lin[i][0] for i in range(10, 15)) == list(range(5))
    # v2 tables refuse the lineage read outright
    t2 = table + "_v2"
    iceberg.create(_df(spark, _rows(0, 3)), t2)
    with pytest.raises(ValueError, match="v3"):
        iceberg.read_lineage(spark, t2)


def test_overwrite_assigns_fresh_ids(spark, table):
    iceberg.create(
        _df(spark, _rows(0, 10)), table, format_version=3
    )
    iceberg.overwrite(_df(spark, _rows(100, 105)), table)
    lin = _lineage(spark, table)
    assert sorted(rid for rid, _ in lin.values()) == list(range(10, 15))
    assert iceberg.current_metadata(table)["next-row-id"] == 15


def test_branch_append_consumes_ids_and_publishes(spark, table):
    iceberg.create(
        _df(spark, _rows(0, 10)), table, format_version=3
    )
    iceberg.create_branch(table, "audit")
    iceberg.append_to_branch(_df(spark, _rows(10, 14)), table, "audit")
    # ids were allocated at the branch commit...
    assert iceberg.current_metadata(table)["next-row-id"] == 14
    # ...and publishing fast-forwards them unchanged
    iceberg.fast_forward(table, "audit")
    lin = _lineage(spark, table)
    assert sorted(rid for rid, _ in lin.values()) == list(range(14))


def test_lineage_composes_with_renames(spark, table):
    """Renamed tables read lineage through the per-generation grouped
    scan: the physical lineage columns carry no field-id and are never
    renamed, so they resolve by their own names in every generation."""
    iceberg.create(
        _df(spark, _rows(0, 10)), table, format_version=3
    )
    before = _lineage(spark, table)
    iceberg.rename_column(table, "val", "amount")
    iceberg.update_where(
        spark, table, "id < 3", {"amount": F.col("amount") + 50.0}
    )
    after = _lineage(spark, table)
    assert all(after[i][0] == before[i][0] for i in range(10))
    head = iceberg.current_metadata(table)["last-sequence-number"]
    assert all((after[i][1] == head) == (i < 3) for i in range(10))
