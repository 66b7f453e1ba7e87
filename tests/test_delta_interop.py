"""Independent Delta interop: a clean-room reader vs the engine writer.

`sources/delta_log.py` claims to write spec-conformant Delta tables, but
the container ships no external Delta reader (no delta jar, no delta-rs,
no network for DuckDB's delta extension — all verified absent), so until
now the format claim rested on self-verification. These tests close that
gap with `tests/delta_reader_independent.py`: a snapshot reader built
ONLY from the public protocol description (stdlib json/os + pyarrow),
sharing zero code with the writer. Every history the writer can produce
(create/append/overwrite/merge/evolve/optimize/restore/checkpoint/
vacuum, plain and hive-partitioned) must reconstruct to the identical
file set and row multiset through both implementations.

Reference anchor: generalizes the plain parquet lake the reference
publishes (`/root/reference/jobs/01_ingest_bronze.py:65`) to the
interoperable Delta format named by BASELINE.md's north star.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log as dlog
from tests import delta_reader_independent as indep


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "interop_table")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, val double")


def _spark_rows(spark, table, version=None):
    return sorted(tuple(r) for r in dlog.read_delta(spark, table, version).collect())


def _assert_version_parity(spark, table, version):
    """File set AND row multiset must agree between the engine reader
    and the independent reader, via checkpoint and via full replay."""
    for use_cp in (True, False):
        snap = indep.snapshot(table, version, use_checkpoint=use_cp)
        assert snap["files"] == dlog.snapshot_files(table, version), (
            f"v{version} file set diverges (use_checkpoint={use_cp})"
        )
        assert sorted(indep.read_rows(table, version, use_checkpoint=use_cp)) == (
            _spark_rows(spark, table, version)
        ), f"v{version} rows diverge (use_checkpoint={use_cp})"


def test_independent_reader_shares_no_code():
    """The reader must be genuinely independent: no import of the
    engine package anywhere in its source, and only stdlib + pyarrow."""
    src_path = os.path.join(os.path.dirname(__file__), "delta_reader_independent.py")
    with open(src_path) as f:
        src = f.read()
    assert "march_mania" not in src
    imports = [
        line.strip()
        for line in src.splitlines()
        if line.startswith(("import ", "from "))
    ]
    allowed = {
        "import json",
        "import os",
        "import struct",
        "import uuid as _uuid",
        "import zlib",
        "import pyarrow.parquet as pq",
        "from __future__ import annotations",
    }
    assert set(imports) <= allowed, f"unexpected imports: {set(imports) - allowed}"


def test_create_append_overwrite_history_full_parity(spark, table):
    """Every version of a create→append→overwrite→append history must
    reconstruct identically through the independent reader."""
    v0 = dlog.create(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), table,
                     stat_cols=("id",))
    v1 = dlog.append(_df(spark, [(3, "a", 3.0)]), table, stat_cols=("id",))
    v2 = dlog.overwrite(_df(spark, [(10, "z", 10.0), (11, "z", 11.0)]), table)
    v3 = dlog.append(_df(spark, [(12, "y", 12.0)]), table)
    assert (v0, v1, v2, v3) == (0, 1, 2, 3)
    for v in range(4):
        _assert_version_parity(spark, table, v)
    # overwrite really dropped the old rows in BOTH readers
    assert {t[0] for t in indep.read_rows(table, 2)} == {10, 11}
    assert {t[0] for t in indep.read_rows(table, 3)} == {10, 11, 12}


def test_merge_history_parity(spark, table):
    dlog.create(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]), table)
    changes = spark.createDataFrame(
        [(2, "B", 20.0, False), (4, "d", 4.0, False), (3, "c", 3.0, True)],
        "id long, cat string, val double, is_delete boolean",
    )
    dlog.merge(changes, table, keys=["id"], delete_col="is_delete")
    for v in (0, 1):
        _assert_version_parity(spark, table, v)
    assert sorted(indep.read_rows(table, 1)) == [
        (1, "a", 1.0), (2, "B", 20.0), (4, "d", 4.0)
    ]


def test_schema_evolution_surfaces_nulls_in_independent_reader(spark, table):
    """After merge_schema append, the independent reader must apply the
    DECLARED (evolved) schema to pre-evolution files: old rows carry
    null for the new column, column order is the log's."""
    dlog.create(_df(spark, [(1, "a", 1.0)]), table)
    wide = spark.createDataFrame([(2, "b", 2.0, "extra")],
                                 "id long, cat string, val double, note string")
    dlog.append(wide, table, merge_schema=True)
    _assert_version_parity(spark, table, 0)
    _assert_version_parity(spark, table, 1)
    assert sorted(indep.read_rows(table, 1)) == [
        (1, "a", 1.0, None), (2, "b", 2.0, "extra")
    ]


def test_optimize_and_restore_histories_parity(spark, table):
    dlog.create(_df(spark, [(i, "a", float(i)) for i in range(10)]), table)
    dlog.append(_df(spark, [(i, "b", float(i)) for i in range(10, 20)]), table)
    dlog.optimize(spark, table, zorder_by=("id",))          # v2: rewrite
    dlog.append(_df(spark, [(99, "x", 99.0)]), table)       # v3
    dlog.restore(table, 1)                                  # v4 == v1 rows
    for v in range(5):
        _assert_version_parity(spark, table, v)
    assert sorted(indep.read_rows(table, 4)) == sorted(indep.read_rows(table, 1))
    # OPTIMIZE changed layout, not rows
    assert sorted(indep.read_rows(table, 2)) == sorted(indep.read_rows(table, 1))
    assert indep.snapshot(table, 2)["files"] != indep.snapshot(table, 1)["files"]


def test_checkpoint_is_self_contained_for_independent_reader(spark, table):
    """A reader arriving AFTER checkpoint must reconstruct the snapshot
    from checkpoint + JSON tail alone — proven by physically removing
    the pre-checkpoint commit files before the independent read."""
    dlog.create(_df(spark, [(1, "a", 1.0)]), table)
    dlog.append(_df(spark, [(2, "b", 2.0)]), table)
    dlog.overwrite(_df(spark, [(3, "c", 3.0), (4, "d", 4.0)]), table)
    cp_v = dlog.checkpoint(table)
    assert cp_v == 2
    dlog.append(_df(spark, [(5, "e", 5.0)]), table)  # v3 tail after cp

    expected_rows = sorted(indep.read_rows(table, 3, use_checkpoint=False))
    expected_files = indep.snapshot(table, 3, use_checkpoint=False)["files"]

    moved = []
    for v in range(cp_v + 1):  # drop commits 0..2; checkpoint covers them
        p = os.path.join(table, "_delta_log", f"{v:020d}.json")
        shutil.move(p, p + ".bak")
        moved.append(p)
    try:
        snap = indep.snapshot(table, 3)  # must not touch the moved files
        assert snap["files"] == expected_files
        assert sorted(indep.read_rows(table, 3)) == expected_rows
        assert snap["protocol"] is not None  # checkpoint carries protocol
        assert snap["schema"]["fields"][0]["name"] == "id"
    finally:
        for p in moved:
            shutil.move(p + ".bak", p)
    _assert_version_parity(spark, table, 3)


def test_partitioned_table_parity_and_log_planned_pruning(spark, table):
    """Hive-partitioned table: the independent reader restores the
    partition column from add-action partitionValues (the files don't
    contain it), and per-partition file sets planned from ITS replay
    agree with the engine's `scan_partitions`."""
    df = _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "c", 4.0)])
    dlog.create(df, table, partition_by=("cat",), stat_cols=("id",))
    dlog.append(_df(spark, [(5, "b", 5.0)]), table)
    for v in (0, 1):
        _assert_version_parity(spark, table, v)
    snap = indep.snapshot(table, 1)
    assert snap["partition_columns"] == ["cat"]
    b_files = sorted(
        p for p, a in snap["adds"].items()
        if a["partitionValues"].get("cat") == "b"
    )
    assert b_files and all(f.startswith("cat=b/") for f in b_files)
    engine_b = sorted(
        tuple(r) for r in dlog.scan_partitions(spark, table, {"cat": "b"}).collect()
    )
    assert {t[0] for t in engine_b} == {3, 5}
    # row parity for just that partition
    indep_b = sorted(
        t for t in indep.read_rows(table, 1) if t[1] == "b"
    )
    assert indep_b == engine_b


def test_partitioned_checkpoint_keeps_partition_values(spark, table):
    """Checkpoints must carry each add's partitionValues — a reader
    planning from the checkpoint (any real Delta reader; here the
    independent one AND the engine's own post-checkpoint replay) would
    otherwise lose the partition column entirely."""
    df = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "b", 3.0)])
    dlog.create(df, table, partition_by=("cat",))
    dlog.checkpoint(table)
    dlog.append(_df(spark, [(4, "c", 4.0)]), table)
    _assert_version_parity(spark, table, 1)
    # log-planned pruning still works when the adds came from the checkpoint
    engine_b = sorted(
        tuple(r) for r in dlog.scan_partitions(spark, table, {"cat": "b"}).collect()
    )
    assert {t[0] for t in engine_b} == {2, 3}
    snap = indep.snapshot(table, 1, use_checkpoint=True)
    cp_adds = {p: a for p, a in snap["adds"].items() if p.startswith("cat=b/")}
    assert cp_adds and all(
        a["partitionValues"].get("cat") == "b" for a in cp_adds.values()
    )


def test_add_action_stats_match_file_contents(spark, table):
    """stats on every add action must agree with the FILES: numRecords
    vs the parquet footer row count, min/max vs the column data —
    checked by the independent reader, because these stats are what a
    real Delta reader plans data skipping from."""
    dlog.create(_df(spark, [(i, "a", float(i)) for i in range(50)]), table,
                stat_cols=("id", "val"))
    dlog.append(_df(spark, [(i, "b", float(i)) for i in range(50, 80)]), table,
                stat_cols=("id", "val"))
    snap = indep.snapshot(table)
    total = 0
    for path, add in snap["adds"].items():
        stats = add["stats"]
        assert stats is not None
        n = indep.file_row_count(table, path)
        assert stats["numRecords"] == n
        total += n
        lo, hi = indep.file_min_max(table, path, "id")
        assert stats["minValues"]["id"] == lo
        assert stats["maxValues"]["id"] == hi
    assert total == 80


def test_vacuum_keeps_latest_snapshot_readable(spark, table):
    dlog.create(_df(spark, [(1, "a", 1.0)]), table)
    dlog.overwrite(_df(spark, [(2, "b", 2.0)]), table)
    before = indep.snapshot(table, 1)["files"]
    deleted = dlog.vacuum(table, retention_ms=0)
    assert deleted  # the v0 file was tombstoned and past retention
    assert not (set(deleted) & set(before))  # live files never deleted
    assert sorted(indep.read_rows(table)) == [(2, "b", 2.0)]


def test_deletion_vectors_parity_both_readers(spark, table):
    """Merge-on-read DELETE via deletion vectors: rows vanish without
    any data-file rewrite, history stays time-travelable, a second
    DELETE merges into the existing DV — and the independent reader
    must agree at every version through its OWN Z85/roaring/CRC
    decoder (the DV bits really are the public format)."""
    dlog.create(_df(spark, [(i, "a", float(i)) for i in range(100)]), table)
    files_before = set(indep.snapshot(table)["files"])
    v1 = dlog.delete_where(spark, table, "id % 10 = 0")
    # no data file rewritten: same physical file set, now DV'd
    snap = indep.snapshot(table)
    assert set(snap["files"]) == files_before
    assert any(a.get("deletionVector") for a in snap["adds"].values())
    # protocol upgraded to the table feature, per spec
    assert snap["protocol"]["minReaderVersion"] == 3
    assert "deletionVectors" in snap["protocol"]["readerFeatures"]
    _assert_version_parity(spark, table, v1)
    assert sorted(t[0] for t in indep.read_rows(table)) == [
        i for i in range(100) if i % 10
    ]
    # second delete on the same files merges position sets
    v2 = dlog.delete_where(spark, table, "id % 10 = 1")
    _assert_version_parity(spark, table, v2)
    assert sorted(t[0] for t in indep.read_rows(table)) == [
        i for i in range(100) if i % 10 not in (0, 1)
    ]
    # time travel: pre-delete and mid-delete versions intact
    assert len(indep.read_rows(table, 0)) == 100
    assert len(indep.read_rows(table, v1)) == 90
    # no-match DELETE commits nothing
    assert dlog.delete_where(spark, table, "id < 0") == v2


def test_deletion_vectors_survive_checkpoint(spark, table):
    """A replay seeded from a checkpoint must keep the DVs — losing
    them would silently resurrect deleted rows."""
    dlog.create(_df(spark, [(i, "a", float(i)) for i in range(40)]), table)
    dlog.delete_where(spark, table, "id >= 30")
    dlog.checkpoint(table)
    dlog.append(_df(spark, [(100, "z", 1.0)]), table)
    for use_cp in (True, False):
        assert sorted(t[0] for t in indep.read_rows(table, use_checkpoint=use_cp)) \
            == list(range(30)) + [100]
    assert sorted(
        r["id"] for r in dlog.read_delta(spark, table).collect()
    ) == list(range(30)) + [100]


def test_deletion_vectors_on_partitioned_table(spark, table):
    dlog.create(
        _df(spark, [(i, f"c{i % 3}", float(i)) for i in range(60)]),
        table, partition_by=["cat"],
    )
    v = dlog.delete_where(spark, table, "id % 4 = 0")
    _assert_version_parity(spark, table, v)
    got = dlog.scan_partitions(spark, table, {"cat": "c1"})
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(60) if i % 3 == 1 and i % 4 != 0
    ]


def test_random_delta_history_sweep_with_dvs(spark, tmp_path):
    """Generative interop for the Delta layer (the Iceberg sweep's
    twin, extended with DV deletes): random append / overwrite /
    dv-delete / optimize / checkpoint sequences must keep both readers
    in exact agreement at every surviving version."""
    import random

    rng = random.Random(20260815)
    for trial in range(4):
        # trial 3 runs the same mix on a ROW-TRACKING table: every op
        # must keep ids consistent between engine and clean-room
        # reader, and no two live rows may share an id
        tracked = trial == 3
        table = str(tmp_path / f"rand_{trial}")
        nid = [0]

        def fresh(n, cat="r", nid=nid):
            rows = [(nid[0] + i, cat, float(nid[0] + i)) for i in range(n)]
            nid[0] += n
            return rows

        def cur_cat():
            # the 2nd column's CURRENT logical name (renames flip it;
            # restore can flip it back)
            return dlog.table_schema(table).fields[1].name

        def batch(rows):
            return _df(spark, rows).withColumnRenamed("cat", cur_cat())

        dlog.create(
            _df(spark, fresh(rng.randrange(3, 8))), table,
            row_tracking=tracked,
        )
        for _ in range(5):
            # trial 0 draws only row-level-decomposable ops so the
            # CDF-fold check below is guaranteed to run at least once
            op = rng.choice(
                ["append", "dv_delete", "dv_delete", "optimize",
                 "checkpoint", "rename", "update", "update"]
                if trial == 0 else
                ["append", "overwrite", "dv_delete", "dv_delete", "optimize",
                 "checkpoint", "merge", "restore", "rename", "update"]
            )
            if op == "append":
                dlog.append(batch(fresh(rng.randrange(1, 5))), table)
            elif op == "overwrite":
                dlog.overwrite(batch(fresh(rng.randrange(2, 6), "ow")), table)
            elif op == "dv_delete":
                dlog.delete_where(spark, table, f"id % 3 = {rng.randrange(3)}")
            elif op == "optimize":
                dlog.optimize(spark, table)
            elif op == "merge":
                live = [t[0] for t in indep.read_rows(table)]
                upd = [(i, "mg", -2.0) for i in
                       rng.sample(live, k=min(2, len(live)))] if live else []
                dlog.merge(
                    batch(upd + fresh(1, "mi")), table, keys=["id"]
                )
            elif op == "restore":
                v = rng.randrange(dlog.latest_version(table) + 1)
                dlog.restore(table, v)
            elif op == "rename":
                dlog.rename_column(
                    table,
                    cur_cat(),
                    "category" if cur_cat() == "cat" else "cat",
                )
            elif op == "update":
                from pyspark.sql import functions as F

                dlog.update_where(
                    spark, table, f"id % 4 = {rng.randrange(4)}",
                    {"val": F.col("val") + 1000.0},
                )
            else:
                # random checkpoint LAYOUT too: classic / multi-part /
                # V2-with-sidecars all feed the same replay
                layout = rng.choice(["classic", "parts", "v2"])
                dlog.checkpoint(
                    table,
                    parts=3 if layout == "parts" else None,
                    v2=layout == "v2",
                )
        v_hi = dlog.latest_version(table)
        for v in range(v_hi + 1):
            assert sorted(indep.read_rows(table, v)) == _spark_rows(
                spark, table, v
            ), f"trial {trial} version {v} diverged"
        if tracked:
            # row-tracking invariants under the random composition:
            # engine and clean-room lineage decodes agree, and live
            # ids never collide (restore/overwrite/merge included —
            # the high-water mark is monotonic, ranges never reused)
            eng = sorted(
                (r[-2], r[-1])
                for r in dlog.read_delta_lineage(spark, table).collect()
            )
            ind = sorted(
                (row[-2], row[-1])
                for row in indep.read_rows(table, with_lineage=True)
            )
            assert eng == ind, f"trial {trial}: lineage decode diverged"
            rids = [r for r, _ in eng if r is not None]
            assert len(rids) == len(set(rids)), (
                f"trial {trial}: duplicate row ids"
            )
        # CDF-fold parity over the whole random history whenever it is
        # row-level decomposable (overwrite/restore/optimize histories
        # legitimately refuse): v0 snapshot + inserts + postimages −
        # deletes − preimages must reproduce the head exactly — the
        # round-8 update-pair reader under arbitrary compositions
        from collections import Counter

        try:
            cdf = dlog.table_changes_cdf(spark, table, 0).collect()
        except dlog.DeltaNonAppendChangeError:
            cdf = None
        if cdf is not None:
            state = Counter(
                tuple(r) for r in dlog.read_delta(spark, table, 0).collect()
            )
            for r in cdf:
                sign = 1 if r[-2] in ("insert", "update_postimage") else -1
                state[tuple(r)[:-2]] += sign
            head = Counter(
                tuple(r) for r in dlog.read_delta(spark, table).collect()
            )
            assert +state == head, f"trial {trial} CDF fold diverged"


def test_table_changes_with_deletes_decomposes_dv_commits(spark, table):
    """CDC contract: inserts are the RAW appended rows, deletes are the
    DV-diff positions' rows, and base-state + signed changes must equal
    the head snapshot exactly."""
    from collections import Counter

    dlog.create(_df(spark, [(i, "a", float(i)) for i in range(50)]), table)
    dlog.append(_df(spark, [(i, "b", float(i)) for i in range(50, 60)]), table)
    dlog.delete_where(spark, table, "id % 10 = 0")
    dlog.delete_where(spark, table, "id % 10 = 1")
    ch = dlog.table_changes(spark, table, 0, include_deletes=True)
    ins = sorted(r["id"] for r in ch.filter("_change_type = 'insert'").collect())
    dels = sorted(r["id"] for r in ch.filter("_change_type = 'delete'").collect())
    assert ins == list(range(50, 60))
    assert dels == [i for i in range(60) if i % 10 in (0, 1)]
    # a row appended then deleted in range nets to zero
    base = Counter(tuple(r) for r in dlog.read_delta(spark, table, 0).collect())
    for r in ch.collect():
        t = (r["id"], r["cat"], r["val"])
        if r["_change_type"] == "insert":
            base[t] += 1
        else:
            base[t] -= 1
            assert base[t] >= 0, f"over-retraction of {t}"
    head = Counter(tuple(r) for r in dlog.read_delta(spark, table).collect())
    assert +base == head
    # append-only mode still refuses DV commits
    with pytest.raises(dlog.DeltaNonAppendChangeError):
        dlog.table_changes(spark, table, 0).count()
    # true rewrites refuse even with include_deletes
    dlog.overwrite(_df(spark, [(999, "z", 9.0)]), table)
    with pytest.raises(dlog.DeltaNonAppendChangeError):
        dlog.table_changes(spark, table, 0, include_deletes=True).count()


def test_random_partitioned_delta_sweep_with_clones(spark, tmp_path):
    """The partitioned-composition torture test: random append /
    dv-delete / update / optimize / checkpoint / rename (data AND
    partition column) / restore / SHALLOW CLONE sequences on a
    PARTITIONED table — a clone switches the history onto the clone
    (absolute-path adds over shared files) and keeps mutating. Both
    readers must agree at every surviving version of the final chain."""
    import random

    rng = random.Random(20260815)

    def _pdf(spark_, rows):
        return spark_.createDataFrame(rows, "id long, g string, val double")

    for trial in range(3):
        table = str(tmp_path / f"prand_{trial}")
        nid = [0]

        def fresh(n, nid=nid):
            rows = [
                (nid[0] + i, str((nid[0] + i) % 3), float(nid[0] + i))
                for i in range(n)
            ]
            nid[0] += n
            return rows

        def names():
            return [f.name for f in dlog.table_schema(table).fields]

        def batch(rows):
            df = _pdf(spark, rows)
            return df.toDF(*names())

        dlog.create(
            _pdf(spark, fresh(rng.randrange(3, 8))), table, partition_by=["g"]
        )
        clone_n = [0]
        for _ in range(6):
            op = rng.choice(
                ["append", "dv_delete", "optimize", "checkpoint",
                 "rename_val", "rename_part", "update", "restore", "clone"]
            )
            if op == "append":
                dlog.append(batch(fresh(rng.randrange(1, 5))), table)
            elif op == "dv_delete":
                dlog.delete_where(spark, table, f"id % 3 = {rng.randrange(3)}")
            elif op == "optimize":
                dlog.optimize(spark, table)
            elif op == "checkpoint":
                layout = rng.choice(["classic", "parts", "v2"])
                dlog.checkpoint(
                    table,
                    parts=2 if layout == "parts" else None,
                    v2=layout == "v2",
                )
            elif op == "rename_val":
                cur = names()[2]
                dlog.rename_column(
                    table, cur, "score" if cur == "val" else "val"
                )
            elif op == "rename_part":
                cur = names()[1]
                dlog.rename_column(table, cur, "grp" if cur == "g" else "g")
            elif op == "update":
                dlog.update_where(
                    spark, table, f"id % 4 = {rng.randrange(4)}",
                    {names()[2]: F.col(names()[2]) + 1000.0},
                )
            elif op == "restore":
                dlog.restore(table, rng.randrange(dlog.latest_version(table) + 1))
            else:  # clone, then continue the random history ON the clone
                clone_n[0] += 1
                tgt = str(tmp_path / f"prand_{trial}_clone{clone_n[0]}")
                dlog.shallow_clone(table, tgt)
                table = tgt
        for v in range(dlog.latest_version(table) + 1):
            assert sorted(indep.read_rows(table, v)) == _spark_rows(
                spark, table, v
            ), f"trial {trial} version {v} diverged"


def test_multipart_checkpoint_both_readers(spark, table):
    """Classic MULTI-PART checkpoints (parts recorded in
    _last_checkpoint, %010d.%010d part naming): replays seeded from
    the parts must equal the never-checkpointed replay in both
    readers, DVs included."""
    dlog.create(
        _df(spark, [(i, "a", float(i)) for i in range(40)]).repartition(4),
        table,
    )
    dlog.delete_where(spark, table, "id % 5 = 0")
    dlog.checkpoint(table, parts=3)
    import json

    cp = json.loads(
        open(os.path.join(table, "_delta_log", "_last_checkpoint")).read()
    )
    assert cp["parts"] == 3
    names = os.listdir(os.path.join(table, "_delta_log"))
    assert sum(1 for n in names if ".checkpoint.00000" in n) == 3
    dlog.append(_df(spark, [(100, "z", 1.0)]), table)  # JSON tail
    want = sorted(i for i in range(40) if i % 5) + [100]
    assert sorted(r["id"] for r in dlog.read_delta(spark, table).collect()) == want
    for use_cp in (True, False):
        assert sorted(
            t[0] for t in indep.read_rows(table, use_checkpoint=use_cp)
        ) == want


def test_v2_checkpoint_with_sidecars_both_readers(spark, table):
    """V2 checkpoints (the v2Checkpoint table-feature layout real
    writers emit): UUID-named top-level file with checkpointMetadata +
    sidecar actions, adds in _delta_log/_sidecars/*.parquet. Both
    readers must reconstruct the snapshot from it — including the
    table configuration and deletion vectors riding the sidecar
    entries."""
    dlog.create(
        _df(spark, [(i, "a", float(i)) for i in range(30)]).repartition(3),
        table,
    )
    dlog.delete_where(spark, table, "id >= 25")
    dlog.checkpoint(table, v2=True, parts=2)
    log = os.path.join(table, "_delta_log")
    tops = [n for n in os.listdir(log)
            if n.endswith(".parquet") and ".checkpoint." in n]
    assert len(tops) == 1 and not tops[0].endswith("checkpoint.parquet")
    side = os.listdir(os.path.join(log, "_sidecars"))
    assert len(side) == 2  # parts=2 sidecar files
    dlog.append(_df(spark, [(200, "z", 2.0)]), table)
    want = list(range(25)) + [200]
    assert sorted(r["id"] for r in dlog.read_delta(spark, table).collect()) == want
    for use_cp in (True, False):
        assert sorted(
            t[0] for t in indep.read_rows(table, use_checkpoint=use_cp)
        ) == want
    # the checkpointed metaData carries configuration (spec field) —
    # mapped tables replayed from a checkpoint keep their mapping
    snap = indep.snapshot(table)
    assert "configuration" in snap


def test_log_cleanup_checkpoint_seeded_readers(spark, table):
    """delta.logRetentionDuration semantics: after checkpoint +
    cleanup_log, the pre-checkpoint commit JSONs are GONE, and every
    current-state consumer — schema, column mapping, DV reads, the
    clean-room reader, even the NEXT checkpoint — must seed from the
    checkpoint instead of the cleaned commits. Travel below the
    horizon honestly raises."""
    dlog.create(_df(spark, [(i, "a", float(i)) for i in range(20)]), table)
    dlog.enable_column_mapping(table)
    dlog.rename_column(table, "cat", "category")
    dlog.delete_where(spark, table, "id % 4 = 0")
    cp_v = dlog.checkpoint(table, v2=True)
    dlog.append(
        spark.createDataFrame(
            [(50, "z", 5.0)], "id long, category string, val double"
        ),
        table,
    )  # JSON tail above the checkpoint
    cleaned = dlog.cleanup_log(table, retention_ms=0)
    assert len(cleaned) == cp_v  # commits 0..cp_v-1 deleted
    for v in range(cp_v):
        assert not os.path.exists(
            os.path.join(table, "_delta_log", f"{v:020d}.json")
        )
    want = sorted(i for i in range(20) if i % 4) + [50]
    # engine: schema (renamed), mapping, DVs all seeded from the cp
    got = dlog.read_delta(spark, table)
    assert "category" in got.columns
    assert sorted(r["id"] for r in got.collect()) == want
    assert dlog.column_mapping(table)["category"] == "cat"
    # clean-room reader through the checkpoint
    assert sorted(t[0] for t in indep.read_rows(table)) == want
    # a NEW checkpoint on the cleaned log keeps protocol + metaData
    dlog.append(
        spark.createDataFrame(
            [(60, "y", 6.0)], "id long, category string, val double"
        ),
        table,
    )
    dlog.checkpoint(table)  # classic, seeded from the v2 predecessor
    snap = indep.snapshot(table)
    assert snap["protocol"] is not None
    assert snap["configuration"].get("delta.columnMapping.mode") == "name"
    assert sorted(t[0] for t in indep.read_rows(table)) == want + [60]
    # below-horizon access refuses instead of misreporting
    with pytest.raises(FileNotFoundError):
        dlog.read_delta(spark, table, 0).collect()
    # timestamp travel lands on surviving history only
    import time as _time

    assert dlog.version_at_timestamp(
        table, int(_time.time() * 1000) + 10_000
    ) == dlog.latest_version(table)


def test_v2_checkpoint_after_multipart_same_version_resolves_top_file(
    spark, table
):
    """Review finding: a superseded multi-part checkpoint leaves
    %010d.%010d part files at the same version; V2 resolution must
    never pick one (it holds a fraction of the adds) — both readers."""
    dlog.create(
        _df(spark, [(i, "a", float(i)) for i in range(30)]).repartition(3),
        table,
    )
    dlog.checkpoint(table, parts=3)       # leaves 3 part files behind
    dlog.checkpoint(table, v2=True)       # same version, new layout
    want = sorted(range(30))
    assert sorted(r["id"] for r in dlog.read_delta(spark, table).collect()) == want
    for use_cp in (True, False):
        assert sorted(
            t[0] for t in indep.read_rows(table, use_checkpoint=use_cp)
        ) == want


def test_vacuum_after_log_cleanup_keeps_live_dv_sidecars(spark, table):
    """Review finding: after cleanup_log removes the commits that
    introduced the live DVs, vacuum must still see them as referenced
    (via the checkpoint-seeded replay) — reclaiming a live sidecar
    silently resurrects deleted rows."""
    dlog.create(_df(spark, [(i, "a", float(i)) for i in range(30)]), table)
    dlog.delete_where(spark, table, "id % 3 = 0")
    dlog.checkpoint(table)
    assert dlog.cleanup_log(table, retention_ms=0)
    deleted = dlog.vacuum(table, retention_ms=0)
    assert not any(d.startswith("deletion_vector_") for d in deleted)
    want = [i for i in range(30) if i % 3]
    assert sorted(r["id"] for r in dlog.read_delta(spark, table).collect()) == want
    assert sorted(t[0] for t in indep.read_rows(table)) == want
