"""Generative NESTED-EVOLUTION sweep (round 13): random dotted-path
nested ops (add / drop / widen of struct members), appends under the
evolving nested shape, v3 DV deletes, and syncs interleaved at random
points. Compositions are where schema machinery breaks, not single
ops — so at every sync point BOTH engines (Iceberg writer, Delta
mirror) must serve the exact row multiset the test derives from first
principles (it knows every batch it wrote and every subfield it
added/dropped, so the expected state is computed independently of
either engine's read path)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from march_mania_spark_lakehouse_spark.sources import delta_log, iceberg


def _spark_info_type(fields):
    return T.StructType(
        [
            T.StructField(n, T.LongType() if t == "long" else T.IntegerType())
            for n, t in fields
        ]
    )


def test_random_nested_evolution_sweep(spark, tmp_path):
    rng = random.Random(20260817)
    for trial in range(2):
        v3 = trial == 1
        it = str(tmp_path / f"i{trial}")
        dt = str(tmp_path / f"d{trial}")
        # info subfields as ordered [(name, "int"|"long")]; expected
        # state: id -> {subfield name: value} (missing = never written)
        info_fields: list = [("a", "int")]
        state: dict = {}
        nid = [0]
        ncol = [0]

        def write_batch(n):
            ids = list(range(nid[0], nid[0] + n))
            nid[0] += n
            rows = []
            for i in ids:
                vals = {
                    name: (i * 13 + j) % 997
                    for j, (name, _t) in enumerate(info_fields)
                }
                state[i] = vals
                rows.append((i, tuple(vals[n0] for n0, _ in info_fields)))
            schema = T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("info", _spark_info_type(info_fields)),
                ]
            )
            return spark.createDataFrame(rows, schema)

        iceberg.create(
            write_batch(rng.randrange(3, 7)),
            it,
            format_version=3 if v3 else 2,
        )
        iceberg.convert_to_delta(it, dt)

        def expected():
            names = [n for n, _ in info_fields]
            return sorted(
                (i, tuple(vals.get(n) for n in names))
                for i, vals in state.items()
            )

        def engine_rows(df):
            return sorted(
                (r.id, tuple(r.info) if r.info is not None else None)
                for r in df.collect()
            )

        def check(tag):
            want = expected()
            got_w = engine_rows(iceberg.read_iceberg(spark, it))
            assert got_w == want, f"trial {trial} {tag}: writer diverged"
            got_m = engine_rows(delta_log.read_delta(spark, dt))
            assert got_m == want, f"trial {trial} {tag}: mirror diverged"

        for step in range(12):
            op = rng.choice(
                ["append", "append", "nested_add", "nested_drop",
                 "nested_widen", "dv_delete", "sync", "sync"]
            )
            if op == "append":
                iceberg.append(write_batch(rng.randrange(1, 4)), it)
            elif op == "nested_add":
                ncol[0] += 1
                name = f"f{ncol[0]}"
                iceberg.add_column(it, f"info.{name}", "int")
                info_fields.append((name, "int"))
                # pre-existing rows read the new subfield as null
            elif op == "nested_drop":
                droppable = [n for n, _ in info_fields]
                if len(droppable) < 2:
                    continue
                name = rng.choice(droppable)
                iceberg.drop_column(it, f"info.{name}")
                info_fields[:] = [
                    (n, t) for n, t in info_fields if n != name
                ]
                for vals in state.values():
                    vals.pop(name, None)
            elif op == "nested_widen":
                ints = [n for n, t in info_fields if t == "int"]
                if not ints:
                    continue
                name = rng.choice(ints)
                iceberg.widen_column(it, f"info.{name}", "long")
                info_fields[:] = [
                    (n, "long" if n == name else t) for n, t in info_fields
                ]
            elif op == "dv_delete":
                if not v3 or not state:
                    continue
                r = rng.randrange(4)
                iceberg.delete_where(spark, it, F.col("id") % 4 == r)
                for i in [i for i in state if i % 4 == r]:
                    del state[i]
            elif op == "sync":
                iceberg.sync_to_delta(it, dt)
                check(f"step {step}")
        iceberg.sync_to_delta(it, dt)
        check("final")
        # the mirror followed every nested generation: its declared
        # schema equals the writer's current image
        m_names = delta_log.table_schema(dt)["info"].dataType.names
        assert m_names == [n for n, _ in info_fields]


def test_random_nested_evolution_sweep_delta_writer(spark, tmp_path):
    """Same sweep, writer roles swapped: random dotted nested ops on
    the DELTA writer, DV deletes, and sync_from_delta at random points
    — the Iceberg mirror checked against the test's first-principles
    expected state at every sync."""
    rng = random.Random(20260818)
    dt = str(tmp_path / "d")
    it = str(tmp_path / "i")
    info_fields: list = [("a", "integer")]
    state: dict = {}
    nid = [0]
    ncol = [0]

    def _type(t):
        return T.LongType() if t == "long" else T.IntegerType()

    def write_batch(n):
        ids = list(range(nid[0], nid[0] + n))
        nid[0] += n
        rows = []
        for i in ids:
            vals = {
                name: (i * 17 + j) % 991
                for j, (name, _t) in enumerate(info_fields)
            }
            state[i] = vals
            rows.append((i, tuple(vals[n0] for n0, _ in info_fields)))
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "info",
                    T.StructType(
                        [
                            T.StructField(n, _type(t))
                            for n, t in info_fields
                        ]
                    ),
                ),
            ]
        )
        return spark.createDataFrame(rows, schema)

    delta_log.create(write_batch(rng.randrange(3, 7)), dt)
    iceberg.convert_from_delta(dt, it)

    def expected():
        names = [n for n, _ in info_fields]
        return sorted(
            (i, tuple(vals.get(n) for n in names))
            for i, vals in state.items()
        )

    def engine_rows(df):
        return sorted(
            (r.id, tuple(r.info) if r.info is not None else None)
            for r in df.collect()
        )

    def check(tag):
        want = expected()
        assert engine_rows(delta_log.read_delta(spark, dt)) == want, (
            f"{tag}: writer diverged"
        )
        assert engine_rows(iceberg.read_iceberg(spark, it)) == want, (
            f"{tag}: mirror diverged"
        )

    for step in range(14):
        op = rng.choice(
            ["append", "append", "nested_add", "nested_drop",
             "nested_widen", "dv_delete", "sync", "sync"]
        )
        if op == "append":
            delta_log.append(write_batch(rng.randrange(1, 4)), dt)
        elif op == "nested_add":
            ncol[0] += 1
            name = f"f{ncol[0]}"
            delta_log.add_column(dt, f"info.{name}", "int")
            info_fields.append((name, "integer"))
        elif op == "nested_drop":
            if len(info_fields) < 2:
                continue
            name = rng.choice([n for n, _ in info_fields])
            delta_log.drop_column(dt, f"info.{name}")
            info_fields[:] = [(n, t) for n, t in info_fields if n != name]
            for vals in state.values():
                vals.pop(name, None)
        elif op == "nested_widen":
            ints = [n for n, t in info_fields if t == "integer"]
            if not ints:
                continue
            name = rng.choice(ints)
            delta_log.widen_column(dt, f"info.{name}", "long")
            info_fields[:] = [
                (n, "long" if n == name else t) for n, t in info_fields
            ]
        elif op == "dv_delete":
            if not state:
                continue
            r = rng.randrange(4)
            delta_log.delete_where(spark, dt, f"id % 4 = {r}")
            for i in [i for i in state if i % 4 == r]:
                del state[i]
        elif op == "sync":
            iceberg.sync_from_delta(dt, it)
            check(f"step {step}")
    iceberg.sync_from_delta(dt, it)
    check("final")
    m_names = iceberg._spark_schema(
        iceberg.current_metadata(it)["schemas"][
            iceberg.current_metadata(it)["current-schema-id"]
        ]
    )["info"].dataType.names
    assert m_names == [n for n, _ in info_fields]
