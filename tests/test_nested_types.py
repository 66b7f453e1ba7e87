"""Round-13 part 2: NESTED TYPES (struct / array / map) in the lake
layer — the 100 TB event-data shape.

Spec grounding (Iceberg spec §Schemas): every nested field — struct
member, list element, map key and value — carries its own unique
field-id; `last-column-id` covers the whole tree. Nested evolution
here is add / drop / widen of STRUCT members by dotted path (metadata
only, zero files touched; old files surface missing subfields as
null), with honest gates on nested renames and list/map-interior
surgery. The Delta mirror follows nested schemas (schemaString is
Spark-JSON-native) and nested evolution replays through sync as a
pure type re-render.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from march_mania_spark_lakehouse_spark.sources import delta_log, iceberg


def _nested_df(spark, n=20, lo=0):
    """k, info struct<status string, cnt int>, items array<double>,
    attrs map<string,long> — one of each container kind."""
    rows = [
        (
            i,
            Row(status="AB"[i % 2], cnt=i),
            [float(i), float(i) + 0.5],
            {"a": i, "b": 2 * i},
        )
        for i in range(lo, lo + n)
    ]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField(
                "info",
                T.StructType(
                    [
                        T.StructField("status", T.StringType()),
                        T.StructField("cnt", T.IntegerType()),
                    ]
                ),
            ),
            T.StructField("items", T.ArrayType(T.DoubleType())),
            T.StructField("attrs", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _canon(df):
    """Rows → sorted list of fully-plain tuples (maps → sorted item
    tuples) so nested frames compare as multisets."""

    def plain(v):
        if isinstance(v, Row):
            return tuple(plain(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, plain(x)) for k, x in v.items()))
        if isinstance(v, list):
            return tuple(plain(x) for x in v)
        return v

    return sorted(plain(r) for r in df.collect())


def test_nested_create_read_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _nested_df(spark)
    iceberg.create(df, t)
    got = iceberg.read_iceberg(spark, t)
    assert _canon(got) == _canon(df)
    # spec field-ids: unique across the tree, last-column-id = max
    meta = iceberg.current_metadata(t)
    sch = meta["schemas"][meta["current-schema-id"]]
    ids = [f["id"] for f in sch["fields"]]
    for f in sch["fields"]:
        ids.extend(iceberg._nested_type_ids(f["type"]))
    assert len(ids) == len(set(ids))
    assert meta["last-column-id"] == max(ids)
    # top-level ids keep the flat 1..n prefix (cross-round stability)
    assert [f["id"] for f in sch["fields"]] == [1, 2, 3, 4]


def test_nested_append_overwrite_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_nested_df(spark, 10), t)
    s1 = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.append(_nested_df(spark, 5, lo=10), t)
    assert iceberg.read_iceberg(spark, t).count() == 15
    got = iceberg.read_iceberg(spark, t, snapshot_id=s1)
    assert _canon(got) == _canon(_nested_df(spark, 10))
    iceberg.overwrite(_nested_df(spark, 3, lo=100), t)
    assert _canon(iceberg.read_iceberg(spark, t)) == _canon(
        _nested_df(spark, 3, lo=100)
    )


def test_append_merge_schema_adds_nested_column(spark, tmp_path):
    t = str(tmp_path / "t")
    base = spark.createDataFrame([(1,), (2,)], "k long")
    iceberg.create(base, t)
    nxt = spark.createDataFrame(
        [(3, Row(a=1, b="x"))],
        "k long, payload struct<a: int, b: string>",
    )
    iceberg.append(nxt, t, merge_schema=True)
    got = iceberg.read_iceberg(spark, t)
    vals = {r.k: r.payload for r in got.collect()}
    assert vals[1] is None and vals[2] is None
    assert vals[3].a == 1 and vals[3].b == "x"
    meta = iceberg.current_metadata(t)
    sch = meta["schemas"][meta["current-schema-id"]]
    payload = [f for f in sch["fields"] if f["name"] == "payload"][0]
    inner = [f["id"] for f in payload["type"]["fields"]]
    assert payload["id"] == 2 and sorted(inner) == [3, 4]
    assert meta["last-column-id"] == 4


def test_add_nested_subfield_dotted_path(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_nested_df(spark, 6), t)
    iceberg.add_column(t, "info.flag", "int")
    # pre-evolution files surface the new subfield as null
    got = iceberg.read_iceberg(spark, t)
    assert got.schema["info"].dataType.names == ["status", "cnt", "flag"]
    assert got.filter(F.col("info.flag").isNotNull()).count() == 0
    # post-evolution appends carry it
    rows = [(100, Row(status="Z", cnt=7, flag=9), [1.0], {"a": 1})]
    schema = iceberg._spark_schema(
        iceberg.current_metadata(t)["schemas"][
            iceberg.current_metadata(t)["current-schema-id"]
        ]
    )
    iceberg.append(spark.createDataFrame(rows, schema), t)
    got = iceberg.read_iceberg(spark, t)
    assert got.filter(F.col("info.flag") == 9).count() == 1
    assert got.filter(F.col("info.flag").isNull()).count() == 6
    # the new nested field got a FRESH id above every existing one
    meta = iceberg.current_metadata(t)
    sch = meta["schemas"][meta["current-schema-id"]]
    info = [f for f in sch["fields"] if f["name"] == "info"][0]
    flag = [f for f in info["type"]["fields"] if f["name"] == "flag"][0]
    assert flag["id"] == meta["last-column-id"]


def test_widen_nested_subfield(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_nested_df(spark, 5), t)
    iceberg.widen_column(t, "info.cnt", "long")
    got = iceberg.read_iceberg(spark, t)
    assert isinstance(got.schema["info"].dataType["cnt"].dataType, T.LongType)
    assert got.select(F.sum("info.cnt").alias("s")).first().s == 10
    with pytest.raises(ValueError):
        iceberg.widen_column(t, "info.status", "long")


def test_drop_nested_subfield_and_resurrection_gate(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_nested_df(spark, 5), t)
    s1 = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.drop_column(t, "info.cnt")
    got = iceberg.read_iceberg(spark, t)
    assert got.schema["info"].dataType.names == ["status"]
    # time travel reads the pre-drop shape
    old = iceberg.read_iceberg(spark, t, snapshot_id=s1)
    assert old.schema["info"].dataType.names == ["status", "cnt"]
    assert old.select(F.sum("info.cnt").alias("s")).first().s == 10
    # the retired nested name cannot come back (old bytes would
    # resurrect — nested reads resolve by name)
    with pytest.raises(iceberg.IcebergSchemaMismatchError):
        iceberg.add_column(t, "info.cnt", "int")
    # dropping the last member is refused (parquet has no empty groups)
    with pytest.raises(ValueError):
        iceberg.drop_column(t, "info.status")


def test_nested_rename_and_container_interiors_gated(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_nested_df(spark, 3), t)
    with pytest.raises(NotImplementedError):
        iceberg.rename_column(t, "info.cnt", "info.n")
    with pytest.raises(NotImplementedError):
        iceberg.add_column(t, "items.scale", "int")  # list interior
    with pytest.raises(NotImplementedError):
        iceberg.add_column(t, "attrs.x", "int")  # map interior


def test_v3_dv_delete_on_nested_predicate(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_nested_df(spark, 20), t, format_version=3)
    iceberg.delete_where(spark, t, F.col("info.status") == "A")
    got = iceberg.read_iceberg(spark, t)
    assert got.count() == 10
    assert got.filter(F.col("info.status") == "A").count() == 0
    # deletes land as DVs, not rewrites
    sid = iceberg.current_metadata(t)["current-snapshot-id"]
    assert iceberg.snapshot_dv_entries(t, sid)


def test_cdc_carries_nested_columns(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_nested_df(spark, 4), t)
    iceberg.append(_nested_df(spark, 2, lo=50), t)
    ch = iceberg.table_changes(spark, t, 1)
    assert ch.count() == 2
    assert {r.k for r in ch.collect()} == {50, 51}
    assert all(r.info.cnt == r.k for r in ch.collect())


def test_convert_to_delta_nested(spark, tmp_path):
    it, dt = str(tmp_path / "it"), str(tmp_path / "dt")
    df = _nested_df(spark, 12)
    iceberg.create(df, it)
    iceberg.convert_to_delta(it, dt)
    assert _canon(delta_log.read_delta(spark, dt)) == _canon(df)


def test_sync_to_delta_across_nested_add_and_drop(spark, tmp_path):
    """Writer-side nested evolution replays onto the Delta mirror as a
    pure schemaString re-render — add shows null history + new values,
    drop prunes, data files untouched."""
    it, dt = str(tmp_path / "it"), str(tmp_path / "dt")
    iceberg.create(_nested_df(spark, 6), it)
    iceberg.convert_to_delta(it, dt)
    iceberg.add_column(it, "info.flag", "int")
    meta = iceberg.current_metadata(it)
    schema = iceberg._spark_schema(meta["schemas"][meta["current-schema-id"]])
    rows = [(100, Row(status="Z", cnt=7, flag=9), [1.0], {"a": 1})]
    iceberg.append(spark.createDataFrame(rows, schema), it)
    iceberg.sync_to_delta(it, dt)
    got = delta_log.read_delta(spark, dt)
    assert got.schema["info"].dataType.names == ["status", "cnt", "flag"]
    assert got.filter(F.col("info.flag") == 9).count() == 1
    assert got.filter(F.col("info.flag").isNull()).count() == 6
    assert _canon(got) == _canon(iceberg.read_iceberg(spark, it))
    # now a nested drop follows too
    iceberg.drop_column(it, "info.cnt")
    iceberg.append(
        spark.createDataFrame(
            [(200, Row(status="Q", flag=1), [2.0], {"b": 2})],
            iceberg._spark_schema(
                iceberg.current_metadata(it)["schemas"][
                    iceberg.current_metadata(it)["current-schema-id"]
                ]
            ),
        ),
        it,
    )
    iceberg.sync_to_delta(it, dt)
    got = delta_log.read_delta(spark, dt)
    assert got.schema["info"].dataType.names == ["status", "flag"]
    assert _canon(got) == _canon(iceberg.read_iceberg(spark, it))


def test_sync_from_delta_nested_add(spark, tmp_path):
    """Delta-writer side: a nested-typed column added on the Delta
    table replays onto the Iceberg mirror with fresh nested ids."""
    dt, it = str(tmp_path / "dt"), str(tmp_path / "it")
    delta_log.create(spark.createDataFrame([(1,), (2,)], "k long"), dt)
    iceberg.convert_from_delta(dt, it)
    delta_log.add_column(dt, "payload", "struct<a: int, b: string>")
    delta_log.append(
        spark.createDataFrame(
            [(3, Row(a=5, b="x"))],
            "k long, payload struct<a: int, b: string>",
        ),
        dt,
    )
    iceberg.sync_from_delta(dt, it)
    got = iceberg.read_iceberg(spark, it)
    vals = {r.k: r.payload for r in got.collect()}
    assert vals[1] is None and vals[3].a == 5 and vals[3].b == "x"
    meta = iceberg.current_metadata(it)
    sch = meta["schemas"][meta["current-schema-id"]]
    payload = [f for f in sch["fields"] if f["name"] == "payload"][0]
    assert isinstance(payload["type"], dict)
    inner_ids = iceberg._nested_type_ids(payload["type"])
    assert len(inner_ids) == len(set(inner_ids))
    assert meta["last-column-id"] == max([payload["id"]] + inner_ids)


def test_nested_widen_through_sync(spark, tmp_path):
    it, dt = str(tmp_path / "it"), str(tmp_path / "dt")
    iceberg.create(_nested_df(spark, 4), it)
    iceberg.convert_to_delta(it, dt)
    iceberg.widen_column(it, "info.cnt", "long")
    meta = iceberg.current_metadata(it)
    schema = iceberg._spark_schema(meta["schemas"][meta["current-schema-id"]])
    big = 2**40
    iceberg.append(
        spark.createDataFrame(
            [(300, Row(status="W", cnt=big), [3.0], {"c": 3})], schema
        ),
        it,
    )
    iceberg.sync_to_delta(it, dt)
    got = delta_log.read_delta(spark, dt)
    assert isinstance(got.schema["info"].dataType["cnt"].dataType, T.LongType)
    assert got.select(F.sum("info.cnt").alias("s")).first().s == 6 + big
    assert _canon(got) == _canon(iceberg.read_iceberg(spark, it))


def test_nested_stat_cols_and_scan_range_pruning(spark, tmp_path):
    """Dotted stat_cols record manifest bounds keyed by the LEAF's own
    field-id (parquet keeps row-group stats per primitive leaf), and
    scan_range prunes on nested predicates from metadata alone — with
    range-clustered files, only the touched file is planned. A
    subsequent nested WIDEN keeps the pruning working (write-time-typed
    bounds decode by payload width)."""
    t = str(tmp_path / "t")
    rows = [(i, Row(cnt=i)) for i in range(100)]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField(
                "info",
                T.StructType([T.StructField("cnt", T.IntegerType())]),
            ),
        ]
    )
    df = spark.createDataFrame(rows, schema).repartitionByRange(4, "k")
    iceberg.create(df, t, stat_cols=["info.cnt"])
    # bounds landed under the nested leaf's field-id
    meta = iceberg.current_metadata(t)
    sch = meta["schemas"][meta["current-schema-id"]]
    fid, ftype = iceberg._resolve_field_path(sch, "info.cnt")
    assert ftype == "int"
    got = iceberg.scan_range(spark, t, "info.cnt", 2, 4)
    assert sorted(r.k for r in got.collect()) == [2, 3, 4]
    assert got.select(F.input_file_name()).distinct().count() == 1
    # nested widen composes: declared long, stored 4-byte bounds decode
    # by payload width, pruning unchanged
    iceberg.widen_column(t, "info.cnt", "long")
    got = iceberg.scan_range(spark, t, "info.cnt", 2, 4)
    assert sorted(r.k for r in got.collect()) == [2, 3, 4]
    assert got.select(F.input_file_name()).distinct().count() == 1


def test_delta_writer_nested_evolution_replays(spark, tmp_path):
    """The symmetric direction: dotted nested add/widen/drop on the
    DELTA writer replay onto the Iceberg mirror through sync as dotted
    ops (name-keyed diff of the type trees)."""
    dt, it = str(tmp_path / "dt"), str(tmp_path / "it")
    base = spark.createDataFrame(
        [(i, Row(status="AB"[i % 2], cnt=i)) for i in range(8)],
        "k long, info struct<status: string, cnt: int>",
    )
    delta_log.create(base, dt)
    iceberg.convert_from_delta(dt, it)
    # add
    delta_log.add_column(dt, "info.flag", "int")
    delta_log.append(
        spark.createDataFrame(
            [(100, Row(status="Z", cnt=1, flag=7))],
            "k long, info struct<status: string, cnt: int, flag: int>",
        ),
        dt,
    )
    iceberg.sync_from_delta(dt, it)
    got = iceberg.read_iceberg(spark, it)
    assert got.schema["info"].dataType.names == ["status", "cnt", "flag"]
    assert got.filter(F.col("info.flag") == 7).count() == 1
    assert got.filter(F.col("info.flag").isNull()).count() == 8
    # widen
    delta_log.widen_column(dt, "info.cnt", "long")
    big = 2**40
    delta_log.append(
        spark.createDataFrame(
            [(200, Row(status="W", cnt=big, flag=1))],
            "k long, info struct<status: string, cnt: long, flag: int>",
        ),
        dt,
    )
    iceberg.sync_from_delta(dt, it)
    got = iceberg.read_iceberg(spark, it)
    assert isinstance(got.schema["info"].dataType["cnt"].dataType, T.LongType)
    assert got.select(F.sum("info.cnt").alias("s")).first().s == 28 + 1 + big
    # drop
    delta_log.drop_column(dt, "info.flag")
    iceberg.sync_from_delta(dt, it)
    got = iceberg.read_iceberg(spark, it)
    assert got.schema["info"].dataType.names == ["status", "cnt"]
    assert _canon(got) == _canon(delta_log.read_delta(spark, dt))
    # the mirror's nested ids stayed unique through the replays
    meta = iceberg.current_metadata(it)
    sch = meta["schemas"][meta["current-schema-id"]]
    ids = [f["id"] for f in sch["fields"]]
    for f in sch["fields"]:
        ids.extend(iceberg._nested_type_ids(f["type"]))
    assert len(ids) == len(set(ids))


def test_delta_writer_nested_gates(spark, tmp_path):
    dt = str(tmp_path / "dt")
    delta_log.create(
        spark.createDataFrame(
            [(1, Row(a=1, b=2))], "k long, info struct<a: int, b: int>"
        ),
        dt,
    )
    delta_log.drop_column(dt, "info.a")
    with pytest.raises(delta_log.DeltaColumnMappingError):
        delta_log.add_column(dt, "info.a", "int")  # resurrection gate
    with pytest.raises(NotImplementedError):
        delta_log.rename_column(dt, "info.b", "info.c")
    with pytest.raises(delta_log.DeltaColumnMappingError):
        delta_log.drop_column(dt, "info.b")  # last member
    with pytest.raises(NotImplementedError):
        delta_log.add_column(dt, "info.b", "int", write_default=3)


def _nested_leaf_bounds_fids(t):
    """Set of field-ids with recorded lower bounds on the CURRENT
    snapshot's live data entries."""
    from march_mania_spark_lakehouse_spark.sources import avro_ocf

    meta = iceberg.current_metadata(t)
    snap = [
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    ][0]
    fids = set()
    for m in avro_ocf.read_ocf(snap["manifest-list"]):
        if m.get("content", 0):
            continue
        for e in avro_ocf.read_ocf(m["manifest_path"]):
            if e["status"] in (0, 1) and not e["data_file"].get("content", 0):
                fids.update(
                    b["key"]
                    for b in (e["data_file"].get("lower_bounds") or [])
                )
    return fids


def test_maintenance_preserves_nested_stats(spark, tmp_path):
    """OPTIMIZE and compact default their stat set to every path the
    live entries carry bounds for — INCLUDING nested leaves — so a
    maintenance pass never silently drops nested data skipping."""
    t = str(tmp_path / "t")
    rows = [(i, Row(cnt=i)) for i in range(100)]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField(
                "info", T.StructType([T.StructField("cnt", T.IntegerType())])
            ),
        ]
    )
    iceberg.create(
        spark.createDataFrame(rows, schema).repartitionByRange(4, "k"),
        t,
        stat_cols=["info.cnt"],
    )
    sch = iceberg.current_metadata(t)["schemas"][0]
    fid, _t = iceberg._resolve_field_path(sch, "info.cnt")
    assert fid in _nested_leaf_bounds_fids(t)
    # OPTIMIZE with no explicit stat_cols: bounds survive the pack
    iceberg.optimize(spark, t)
    assert fid in _nested_leaf_bounds_fids(t)
    got = iceberg.scan_range(spark, t, "info.cnt", 2, 4)
    assert sorted(r.k for r in got.collect()) == [2, 3, 4]
    # compact (full rewrite) keeps them too
    iceberg.compact(spark, t)
    assert fid in _nested_leaf_bounds_fids(t)
    got = iceberg.scan_range(spark, t, "info.cnt", 2, 4)
    assert sorted(r.k for r in got.collect()) == [2, 3, 4]


def test_delta_nested_stats_and_scan_pruned(spark, tmp_path):
    """Delta-side nested data skipping: add-action stats key by the
    parquet LEAF PATH (dotted), so stat_cols=['info.cnt'] records
    nested min/max and scan_pruned plans from the log alone — and
    OPTIMIZE's live-stat defaulting preserves the dotted keys.
    (Divergence note: reference Delta nests its stats objects; this
    engine keys them flat by dotted path — self-consistent across its
    writer, planner, and maintenance.)"""
    t = str(tmp_path / "t")
    rows = [(i, Row(cnt=i)) for i in range(100)]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField(
                "info", T.StructType([T.StructField("cnt", T.IntegerType())])
            ),
        ]
    )
    delta_log.create(
        spark.createDataFrame(rows, schema).repartitionByRange(4, "k"),
        t,
        stat_cols=["info.cnt"],
    )
    import json as _json

    v = delta_log.latest_version(t)
    stats = [
        _json.loads(a["stats"])
        for a in delta_log._replay(t, v).values()
        if a.get("stats")
    ]
    assert stats and all("info.cnt" in s["minValues"] for s in stats)
    got = delta_log.scan_pruned(spark, t, "info.cnt", 2, 4)
    assert sorted(r.k for r in got.collect()) == [2, 3, 4]
    assert got.select(F.input_file_name()).distinct().count() == 1
    # OPTIMIZE defaults its stat set from the live adds — dotted keys
    # survive the pack
    delta_log.optimize(spark, t)
    v = delta_log.latest_version(t)
    stats = [
        _json.loads(a["stats"])
        for a in delta_log._replay(t, v).values()
        if a.get("stats")
    ]
    assert stats and all("info.cnt" in s["minValues"] for s in stats)
    got = delta_log.scan_pruned(spark, t, "info.cnt", 2, 4)
    assert sorted(r.k for r in got.collect()) == [2, 3, 4]
