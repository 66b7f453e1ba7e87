"""Iceberg v3 COLUMN DEFAULTS (round-10): `add_column` with an
``initial-default`` (rows written before the column existed read back
as the default — discriminated PHYSICALLY: pre-evolution footers lack
the column, post-evolution explicit nulls keep null, per spec) and a
``write-default`` (batches omitting the column are filled at write
time). Metadata-only: zero files touched by the ADD. Clean-room
independent reader applies the same rules."""

from __future__ import annotations

import pytest

from march_mania_spark_lakehouse_spark.sources import iceberg
from tests import iceberg_reader_independent as indep


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows, schema="id long, cat string, val double"):
    return spark.createDataFrame(rows, schema)


def _both(spark, table):
    eng = sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, table).collect()
    )
    assert sorted(indep.read_rows(table)) == eng
    return eng


def test_initial_default_fills_old_files_only(spark, table):
    iceberg.create(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), table, format_version=3
    )
    v_before = iceberg.current_version(table)
    iceberg.add_column(table, "score", "long", default=7)
    # metadata-only: same data files, new metadata version
    assert iceberg.current_version(table) == v_before + 1
    assert iceberg.snapshot_files(table) == iceberg.snapshot_files(table)
    # old rows surface the default through BOTH readers
    assert _both(spark, table) == [(1, "a", 1.0, 7), (2, "b", 2.0, 7)]
    # a post-evolution append with an EXPLICIT null keeps null — the
    # default applies by footer absence, not by value
    iceberg.append(
        _df(
            spark,
            [(3, "c", 3.0, 99), (4, "d", 4.0, None)],
            "id long, cat string, val double, score long",
        ),
        table,
    )
    assert _both(spark, table) == [
        (1, "a", 1.0, 7),
        (2, "b", 2.0, 7),
        (3, "c", 3.0, 99),
        (4, "d", 4.0, None),
    ]
    # time travel to the pre-evolution snapshot: no phantom column
    first = iceberg.snapshot_ids(table)[0]
    assert sorted(indep.read_rows(table, first)) == [
        (1, "a", 1.0), (2, "b", 2.0)
    ]


def test_write_default_fills_omitted_batches(spark, table):
    iceberg.create(
        _df(spark, [(1, "a", 1.0)]), table, format_version=3
    )
    iceberg.add_column(table, "tier", "string", default="bronze",
                       write_default="silver")
    # a batch OMITTING the column gets the write-default at write time
    iceberg.append(_df(spark, [(2, "b", 2.0)]), table)
    assert _both(spark, table) == [
        (1, "a", 1.0, "bronze"),   # pre-evolution: initial-default
        (2, "b", 2.0, "silver"),   # omitted at write: write-default
    ]


def test_defaults_compose_with_dv_delete_and_filters(spark, table):
    iceberg.create(
        _df(spark, [(i, "x", float(i)) for i in range(10)]),
        table,
        format_version=3,
    )
    iceberg.add_column(table, "flag", "long", default=1)
    iceberg.append(
        _df(
            spark,
            [(10, "y", 10.0, 0), (11, "y", 11.0, 0)],
            "id long, cat string, val double, flag long",
        ),
        table,
    )
    iceberg.delete_where(spark, table, "id % 3 = 0")  # v3 -> DV
    rows = _both(spark, table)
    assert all(
        (r[3] == 1) == (r[0] < 10) for r in rows
    )
    assert {r[0] for r in rows} == {
        i for i in range(12) if i % 3 != 0
    }
    # filters on the defaulted column work through the engine read
    got = sorted(
        r.id
        for r in iceberg.read_iceberg(spark, table)
        .filter("flag = 1")
        .collect()
    )
    assert got == [1, 2, 4, 5, 7, 8]


def test_default_gates(spark, table):
    iceberg.create(_df(spark, [(1, "a", 1.0)]), table)  # v2
    with pytest.raises(ValueError, match="v3"):
        iceberg.add_column(table, "score", "long", default=7)
    # plain (no-default) add works on v2 — metadata-only null fill
    iceberg.add_column(table, "note", "string")
    assert _both(spark, table) == [(1, "a", 1.0, None)]
    # identity-partitioned v3 tables refuse defaulted adds (honest)
    t2 = table + "_part"
    iceberg.create(
        _df(spark, [(1, "a", 1.0)]), t2, partition_by=("cat",),
        format_version=3,
    )
    with pytest.raises(NotImplementedError, match="identity"):
        iceberg.add_column(t2, "score", "long", default=7)
    # a dropped/renamed name can never be recycled
    t3 = table + "_hist"
    iceberg.create(_df(spark, [(1, "a", 1.0)]), t3, format_version=3)
    iceberg.rename_column(t3, "val", "amount")
    with pytest.raises(iceberg.IcebergSchemaMismatchError):
        iceberg.add_column(t3, "val", "double", default=0.0)


def test_defaults_compose_with_renames(spark, table):
    """A defaulted column on a table that LATER renames another column:
    both read through the same footer-grouped scan."""
    iceberg.create(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), table,
        format_version=3,
    )
    iceberg.add_column(table, "score", "long", default=5)
    iceberg.rename_column(table, "val", "amount")
    iceberg.append(
        spark.createDataFrame(
            [(3, "c", 3.0, 8)],
            "id long, cat string, amount double, score long",
        ),
        table,
    )
    assert _both(spark, table) == [
        (1, "a", 1.0, 5), (2, "b", 2.0, 5), (3, "c", 3.0, 8)
    ]


# --------------------------------------------------------------------------
# Delta write-time defaults (allowColumnDefaults): the OTHER spec's
# semantics, preserved honestly — defaults fill batches that omit the
# column at WRITE time; pre-existing rows read null (no retroactive
# fill, deliberately unlike Iceberg's initial-default above).
# --------------------------------------------------------------------------

from march_mania_spark_lakehouse_spark.sources import delta_log as dl  # noqa: E402
from tests import delta_reader_independent as delta_indep  # noqa: E402


def _dboth(spark, table):
    eng = sorted(
        tuple(r) for r in dl.read_delta(spark, table).collect()
    )
    assert sorted(delta_indep.read_rows(table)) == eng
    return eng


def test_delta_write_default_fills_future_batches_only(spark, tmp_path):
    t = str(tmp_path / "delta")
    dl.create(_df(spark, [(1, "a", 1.0)]), t)
    dl.add_column(t, "tier", "string", write_default="silver")
    # feature declared
    proto = dl._effective_protocol(t, dl.latest_version(t))
    assert "allowColumnDefaults" in proto["writerFeatures"]
    # a batch OMITTING the column gets the default; old rows stay null
    dl.append(_df(spark, [(2, "b", 2.0)]), t)
    # a batch with explicit values (null included) wins
    dl.append(
        _df(
            spark,
            [(3, "c", 3.0, "gold"), (4, "d", 4.0, None)],
            "id long, cat string, val double, tier string",
        ),
        t,
    )
    assert _dboth(spark, t) == [
        (1, "a", 1.0, None),      # pre-add: write-time only, no fill
        (2, "b", 2.0, "silver"),  # omitted: default
        (3, "c", 3.0, "gold"),    # explicit
        (4, "d", 4.0, None),      # explicit null wins
    ]


def test_delta_add_column_plain_and_numeric_default(spark, tmp_path):
    t = str(tmp_path / "delta")
    dl.create(_df(spark, [(1, "a", 1.0)]), t)
    dl.add_column(t, "note", "string")  # no default: plain null add
    dl.add_column(t, "score", "bigint", write_default=7)
    dl.append(_df(spark, [(2, "b", 2.0)]), t)
    assert _dboth(spark, t) == [
        (1, "a", 1.0, None, None),
        (2, "b", 2.0, None, 7),
    ]
    with pytest.raises(ValueError, match="already"):
        dl.add_column(t, "score", "bigint")
    # defaults compose with DV deletes and OPTIMIZE (write-time values
    # are physical once written — rewrites keep them)
    dl.delete_where(spark, t, "id = 1")
    dl.optimize(spark, t)
    assert _dboth(spark, t) == [(2, "b", 2.0, None, 7)]
