"""Generative continuous-sync sweep (round 11): random writer-side op
mixes — data ops AND schema evolution — with syncs interleaved at
random points. Compositions are where metadata layers break, not
single operations: at every sync point the mirror must serve the
writer's exact row multiset through BOTH clean-room independent
readers, and on row-tracking trials the carried ``_row_id`` must agree
per key across the format line."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log as dlog
from march_mania_spark_lakehouse_spark.sources import iceberg
from tests import delta_reader_independent as delta_indep
from tests import iceberg_reader_independent as ice_indep


def _mk_batch(spark, schema, ids):
    """Rows matching the writer's CURRENT schema: id = the key, every
    other column a deterministic function of (id, position, type)."""
    rows = []
    for i in ids:
        row = []
        for pos, f in enumerate(schema.fields):
            t = f.dataType.simpleString()
            if f.name == "id":
                row.append(i)
            elif t in ("bigint", "int"):
                v = (i * 7 + pos) % 1000
                row.append(int(v) if t == "int" else v)
            elif t == "double":
                row.append(float(i) + pos)
            else:
                row.append(f"s{(i + pos) % 5}")
        rows.append(tuple(row))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    return spark.createDataFrame(rows, ddl)


def _delta_schema(dt):
    from pyspark.sql import types as T

    sch = dlog.table_schema(dt)
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in sch.fields]
    )


def test_random_sync_sweep_delta_writer(spark, tmp_path):
    """Delta writer → Iceberg mirror: appends, DV deletes, updates,
    OPTIMIZE, overwrites, add/rename/widen/drop, and mirror-side
    compaction, synced at random points."""
    rng = random.Random(20260816)
    for trial in range(3):
        tracked = trial == 2
        dt = str(tmp_path / f"d{trial}")
        it = str(tmp_path / f"i{trial}")
        nid = [0]
        ncol = [0]

        def fresh(n, nid=nid):
            ids = list(range(nid[0], nid[0] + n))
            nid[0] += n
            return ids

        dlog.create(
            _mk_batch(
                spark,
                spark.createDataFrame(
                    [], "id long, cat string, val double"
                ).schema,
                fresh(rng.randrange(4, 9)),
            ),
            dt,
            row_tracking=tracked,
        )
        iceberg.convert_from_delta(dt, it)
        int_cols: list = []

        def check():
            want = sorted(delta_indep.read_rows(dt))
            assert sorted(
                tuple(r) for r in dlog.read_delta(spark, dt).collect()
            ) == want, f"trial {trial}: delta engine/clean-room diverged"
            eng = sorted(
                tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
            )
            assert eng == want, f"trial {trial}: engine mirror diverged"
            assert sorted(ice_indep.read_rows(it)) == want, (
                f"trial {trial}: clean-room mirror diverged"
            )
            if tracked:
                d_lin = {
                    r[0]: r[-2]
                    for r in delta_indep.read_rows(dt, with_lineage=True)
                }
                i_lin = {
                    r.id: r._row_id
                    for r in iceberg.read_lineage(spark, it).collect()
                }
                assert d_lin == i_lin, (
                    f"trial {trial}: carried row ids diverged"
                )

        for step in range(10):
            op = rng.choice(
                ["append", "append", "dv_delete", "update", "optimize",
                 "overwrite", "add", "add_default", "rename", "widen",
                 "drop", "mirror_compact", "restore", "repartition",
                 "reorg"]
            )
            if op == "append":
                dlog.append(
                    _mk_batch(spark, _delta_schema(dt), fresh(rng.randrange(1, 5))),
                    dt,
                )
            elif op == "dv_delete":
                dlog.delete_where(spark, dt, f"id % 3 = {rng.randrange(3)}")
            elif op == "update":
                dlog.update_where(
                    spark, dt, f"id % 4 = {rng.randrange(4)}",
                    {"val": "val + 1000.0"},
                )
            elif op == "optimize":
                dlog.optimize(spark, dt)
            elif op == "reorg":
                # REORG APPLY (PURGE): rewrite only DV-carrying files;
                # no-op when the head carries none
                dlog.reorg_purge(spark, dt)
            elif op == "overwrite":
                dlog.overwrite(
                    _mk_batch(spark, _delta_schema(dt), fresh(rng.randrange(2, 6))),
                    dt,
                )
            elif op == "add":
                ncol[0] += 1
                t = rng.choice(["bigint", "int"])
                name = f"x{ncol[0]}"
                dlog.add_column(dt, name, t)
                if t == "int":
                    int_cols.append(name)
            elif op == "add_default":
                ncol[0] += 1
                dlog.add_column(
                    dt, f"x{ncol[0]}", "bigint", write_default=rng.randrange(9)
                )
            elif op == "rename":
                cur = dlog.table_schema(dt).fields[1].name
                dlog.rename_column(
                    dt, cur, "category" if cur == "cat" else "cat"
                )
            elif op == "widen" and int_cols:
                dlog.widen_column(dt, int_cols.pop(), "long")
            elif op == "drop":
                extras = [
                    f.name
                    for f in dlog.table_schema(dt).fields
                    if f.name.startswith("x")
                ]
                if extras:
                    victim = rng.choice(extras)
                    dlog.drop_column(dt, victim)
                    if victim in int_cols:
                        int_cols.remove(victim)
            elif op == "mirror_compact":
                if iceberg.snapshot_files(it):
                    iceberg.optimize(spark, it, small_file_bytes=1 << 30)
            elif op == "restore":
                # writer-side time travel: restore is a linear
                # compensating commit, so the sync replays it like any
                # other data commit. Crossing a columnMapping /
                # rowTracking enablement is an HONEST engine gate —
                # the sweep treats it as a refused op, not a failure.
                cur_v = dlog.latest_version(dt)
                try:
                    dlog.restore(dt, max(0, cur_v - rng.randrange(1, 4)))
                except NotImplementedError:
                    pass
            elif op == "repartition":
                # REPLACE PARTITIONED BY flips between unpartitioned
                # and id-partitioned; the mirror follows with one
                # partition-evolution commit
                cur_parts = dlog.table_partition_columns(dt)
                dlog.repartition_table(
                    spark, dt, [] if cur_parts else ["id"]
                )
            if rng.random() < 0.5:
                iceberg.sync_from_delta(dt, it)
                check()
        iceberg.sync_from_delta(dt, it)
        check()


def test_random_sync_sweep_iceberg_writer(spark, tmp_path):
    """Iceberg writer → Delta mirror: appends, DV deletes (v3) or
    POSITION-DELETE parquet (the v2 trial — rewrite='auto' converts in
    flight), EQUALITY deletes (resolved to DVs in flight, round 13),
    updates, compaction, identity RELAYOUT (repartition_table — the
    mirror follows with one metaData+swap commit), rollback, snapshot
    EXPIRY (the sync-cursor tag must keep continuous sync alive),
    add/widen/drop/RENAME (a post-rename data file flips the mirror to
    columnMapping.mode=id — every file this engine writes carries
    parquet field ids), and mirror-side OPTIMIZE, synced at random
    points."""
    rng = random.Random(20260817)
    for trial in range(3):
        v2 = trial == 1  # the position-delete-parquet generation
        it = str(tmp_path / f"ri{trial}")
        dt = str(tmp_path / f"rd{trial}")
        nid = [0]
        ncol = [0]

        def fresh(n, nid=nid):
            ids = list(range(nid[0], nid[0] + n))
            nid[0] += n
            return ids

        iceberg.create(
            _mk_batch(
                spark,
                spark.createDataFrame(
                    [], "id long, cat string, val double"
                ).schema,
                fresh(rng.randrange(4, 9)),
            ),
            it,
            format_version=2 if v2 else 3,
        )
        iceberg.convert_to_delta(it, dt)
        int_cols: list = []

        def ice_schema():
            from pyspark.sql import types as T

            meta = iceberg.current_metadata(it)
            decl = meta["schemas"][meta["current-schema-id"]]
            back = {
                "long": T.LongType(), "int": T.IntegerType(),
                "string": T.StringType(), "double": T.DoubleType(),
            }
            return T.StructType(
                [T.StructField(f["name"], back[f["type"]], True)
                 for f in decl["fields"]]
            )

        def check():
            want = sorted(
                tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
            )
            eng = sorted(
                tuple(r) for r in dlog.read_delta(spark, dt).collect()
            )
            assert eng == want, f"trial {trial}: engine mirror diverged"
            assert sorted(delta_indep.read_rows(dt)) == want, (
                f"trial {trial}: clean-room mirror diverged"
            )

        ops = [
            "append", "append", "dv_delete", "update", "compact",
            "add", "widen", "drop", "rename",
            "mirror_optimize", "rollback", "eq_delete", "evolve_spec",
            "expire",
        ]
        if not v2:
            ops.append("add_default")  # column defaults are v3-only
        for step in range(10):
            op = rng.choice(ops)
            if op == "append":
                iceberg.append(
                    _mk_batch(spark, ice_schema(), fresh(rng.randrange(1, 5))),
                    it,
                )
            elif op == "rename":
                cur = [f.name for f in ice_schema().fields][1]
                try:
                    iceberg.rename_column(
                        it, cur, "category" if cur == "cat" else "cat"
                    )
                except NotImplementedError:
                    # identity-partition source after an evolve_spec,
                    # or a live eq-delete key: honest engine gates —
                    # refused op, not a failure
                    pass
            elif op == "dv_delete":
                iceberg.delete_where(
                    spark, it, f"id % 3 = {rng.randrange(3)}"
                )
            elif op == "eq_delete":
                # CDC-style equality tombstones on the key column;
                # rewrite='auto' resolves them to mirror DVs in flight
                victims = [
                    i for i in range(nid[0]) if i % 5 == rng.randrange(5)
                ][-4:]
                if victims:
                    iceberg.delete_by_equality(
                        spark,
                        it,
                        spark.createDataFrame(
                            [(i,) for i in victims], "id long"
                        ),
                    )
            elif op == "evolve_spec":
                # identity relayout [] ↔ [cat-ish]: a full rewrite
                # under the new spec; the mirror follows with one
                # metaData + full-swap commit
                cur_spec = iceberg._spec_info(
                    iceberg.current_metadata(it)
                )
                target = (
                    [] if cur_spec else [ice_schema().fields[1].name]
                )
                try:
                    iceberg.repartition_table(spark, it, target)
                except NotImplementedError:
                    pass  # e.g. relayout onto a gated combination
            elif op == "expire":
                # aggressive retention: the auto-managed sync-cursor
                # tag must keep the cursor snapshot alive so the next
                # sync never needs a re-convert
                iceberg.expire_snapshots(it, keep_last=1)
            elif op == "update":
                iceberg.update_where(
                    spark, it, f"id % 4 = {rng.randrange(4)}",
                    {"val": F.col("val") + 1000.0},
                )
            elif op == "compact":
                if iceberg.snapshot_files(it):
                    iceberg.optimize(spark, it, small_file_bytes=1 << 30)
            elif op == "add":
                ncol[0] += 1
                t = rng.choice(["long", "int"])
                name = f"x{ncol[0]}"
                iceberg.add_column(it, name, t)
                if t == "int":
                    int_cols.append(name)
            elif op == "add_default":
                ncol[0] += 1
                iceberg.add_column(
                    it, f"x{ncol[0]}", "long",
                    write_default=rng.randrange(9),
                )
            elif op == "widen" and int_cols:
                iceberg.widen_column(it, int_cols.pop(), "long")
            elif op == "drop":
                extras = [
                    f["name"]
                    for f in iceberg.current_metadata(it)["schemas"][
                        iceberg.current_metadata(it)["current-schema-id"]
                    ]["fields"]
                    if f["name"].startswith("x")
                ]
                if extras:
                    victim = rng.choice(extras)
                    iceberg.drop_column(it, victim)
                    if victim in int_cols:
                        int_cols.remove(victim)
            elif op == "mirror_optimize":
                if dlog.snapshot_files(dt):
                    dlog.optimize(spark, dt)
            elif op == "rollback":
                # writer-side rollback: the NEXT sync must detect the
                # off-ancestry cursor and emit a compensating commit
                meta = iceberg.current_metadata(it)
                by_sid = {
                    s["snapshot-id"]: s for s in meta["snapshots"]
                }
                chain, node = [], meta["current-snapshot-id"]
                while node in by_sid:
                    chain.append(node)
                    node = by_sid[node].get("parent-snapshot-id", -1)
                if len(chain) > 1:
                    iceberg.rollback_to_snapshot(
                        it, chain[rng.randrange(1, min(4, len(chain)))]
                    )
            if rng.random() < 0.5:
                iceberg.sync_to_delta(it, dt, rewrite="auto")
                check()
        iceberg.sync_to_delta(it, dt, rewrite="auto")
        check()
