"""Custom connector via the Python Data Source API (Spark 4).

The reference's only custom "connector" behavior is registry-routed CSV
ingest (`jobs/01_ingest_bronze.py:43-63`); this shows the engine-native
way to add a NEW source format: a `DataSource` subclass whose reader
declares its own partitioning, so Spark schedules one task per input
split exactly like a file scan — the pattern for wrapping any external
system (an API, a queue, a proprietary store) as a first-class table.

The implementation here is a deterministic synthetic documents
generator (seeded per partition, no RNG state shared across tasks):
useful for tests and load generation, and honest about the scale
contract — partitions() defines parallelism, read() streams rows
without materializing the partition.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N)`` after
    ``spark.dataSource.register(SyntheticDocsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, part int"

    def reader(self, schema) -> DataSourceReader:  # noqa: ARG002 (API signature)
        return _SyntheticDocsReader(self.options)


_WORDS = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 100))
        self.parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        for d in range(i, self.rows, self.parts):
            text = " ".join(_WORDS[(d + j) % len(_WORDS)] for j in range(5 + d % 7))
            yield (d, text, i)


# --------------------------------------------------------------------------
# Streaming side of the same connector: a SimpleDataSourceStreamReader
# that emits the document sequence in offset-tracked micro-batches.
# Offsets are {"index": n} dicts checkpointed by Spark — restarts resume
# from the committed offset, and readBetweenOffsets() regenerates any
# replayed range deterministically (same contract a Kafka-style source
# honors; determinism here plays the role of the broker's log).
# The simple reader runs on the driver, which is the documented fit for
# low-rate control-plane streams; high-throughput sources implement the
# partition-planning DataSourceStreamReader instead.
# --------------------------------------------------------------------------


def _doc_row(d: int) -> tuple:
    text = " ".join(_WORDS[(d + j) % len(_WORDS)] for j in range(5 + d % 7))
    return (d, text, d % 4)


class _SyntheticDocsStreamReader:
    def __init__(self, options: dict) -> None:
        self.max_rows = int(options.get("maxrows", 200))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        # Contract: return ALL data available past `start` plus the next
        # start offset — availableNow snapshots exactly one read() call,
        # so chunking here would silently truncate the drain. `maxrows`
        # is the source's current high-water mark (a later run with a
        # higher mark resumes from the checkpointed offset).
        i = int(start["index"])
        end = max(i, self.max_rows)
        return (iter([_doc_row(d) for d in range(i, end)]), {"index": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_doc_row(d) for d in range(int(start["index"]), int(end["index"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing external to ack; determinism is the replay log


class SyntheticDocsStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_docs_stream")`` with option
    ``maxrows``, the source's current high-water mark: an availableNow
    run drains up to it and terminates; a later run with a higher mark
    resumes from the checkpointed offset."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> str:
        return "doc_id bigint, text string, part int"

    def simpleStreamReader(self, schema):  # noqa: ARG002 (API signature)
        return _SyntheticDocsStreamReader(self.options)


# --------------------------------------------------------------------------
# Streaming FROM a Delta-format table: the transaction log is already a
# replayable ordered change log, so a stream source falls out of it —
# offsets are table versions, a micro-batch is the rows added by the
# commits since the checkpointed version (append-only contract, same as
# `delta_log.table_changes`), and replay is deterministic because
# committed versions are immutable. Data files are read driver-side
# with pyarrow (the simple-reader contract; no SparkSession needed) —
# the documented fit for control-plane-rate streams. Partitioned and
# column-mapped tables compose: partition columns restore from each
# add's partitionValues, data columns read under physical names.
# --------------------------------------------------------------------------


def _cast_pv(s: "str | None", spark_type_name: str):
    """Hive partition values are strings in the Delta log; cast per the
    declared Spark type. The streaming readers' counterpart of the
    batch scan's partition-cast pass."""
    if s is None or s == "__HIVE_DEFAULT_PARTITION__":
        return None
    if spark_type_name in ("bigint", "int", "smallint", "tinyint"):
        return int(s)
    if spark_type_name in ("double", "float"):
        return float(s)
    if spark_type_name == "boolean":
        return s == "true"
    if spark_type_name == "date":
        import datetime

        return datetime.date.fromisoformat(s)
    if spark_type_name.startswith("timestamp"):
        import datetime

        return datetime.datetime.fromisoformat(s)
    if spark_type_name == "string":
        return s
    if spark_type_name.startswith("decimal"):
        import decimal
        import re

        # quantize to the DECLARED scale (the batch scan's rule: the
        # log string is canonical but may drop trailing zeros)
        m = re.match(r"decimal\((\d+),\s*(-?\d+)\)", spark_type_name)
        d = decimal.Decimal(s)
        if m:
            d = d.quantize(decimal.Decimal(1).scaleb(-int(m.group(2))))
        return d
    raise NotImplementedError(
        f"partition type {spark_type_name!r} in a streaming source"
    )


def _iceberg_spark_type(type_name: str):
    """Iceberg schema type name → Spark type for the streaming
    DataSources' declared schemas (decimal parsed by precision/scale;
    plain ntz timestamps must NOT map to TimestampType or naive values
    get session-timezone-shifted)."""
    import re

    from pyspark.sql import types as T

    if type_name.startswith("decimal"):
        p, s = re.findall(r"-?\d+", type_name)
        return T.DecimalType(int(p), int(s))
    return {
        "long": T.LongType(), "int": T.IntegerType(),
        "string": T.StringType(), "double": T.DoubleType(),
        "float": T.FloatType(), "boolean": T.BooleanType(),
        "date": T.DateType(), "timestamptz": T.TimestampType(),
        "timestamp": T.TimestampNTZType(),
        "binary": T.BinaryType(),
    }[type_name]


class _DeltaTableStreamReader:
    def __init__(self, options: dict) -> None:
        self.table = options["path"]

    def initialOffset(self) -> dict:
        return {"version": -1}

    def _added_files(self, lo: int, hi: int) -> list:
        from march_mania_spark_lakehouse_spark.sources import delta_log

        files = []
        for v in range(lo + 1, hi + 1):
            p = delta_log._commit_path(self.table, v)
            if not os.path.exists(p):
                raise FileNotFoundError(f"missing commit {v} for {self.table}")
            for a in delta_log._read_actions(p):
                if "remove" in a and a["remove"].get("dataChange", True):
                    raise delta_log.DeltaNonAppendChangeError(
                        f"commit {v} rewrites files; cannot stream it as appends"
                    )
                if "add" in a and a["add"].get("dataChange", True):
                    files.append(
                        (
                            a["add"]["path"],
                            a["add"].get("partitionValues") or {},
                            a["add"].get("deletionVector"),
                        )
                    )
        return files

    def _rows(self, files: list):
        import pyarrow.parquet as pq

        from march_mania_spark_lakehouse_spark.sources import (
            deletion_vectors,
            delta_log,
        )

        schema = delta_log.table_schema(self.table)
        part_cols = set(delta_log.table_partition_columns(self.table))
        mapping = delta_log.column_mapping(self.table) or {}
        cols = [f.name for f in schema.fields]
        # column-mapped tables store PHYSICAL names in files and key
        # partitionValues by them; one lookup per field translates
        phys = {c: mapping.get(c, c) for c in cols}
        types = {f.name: f.dataType.simpleString() for f in schema.fields}
        for rel, pv, dv in files:
            t = pq.read_table(os.path.join(self.table, rel))
            names = set(t.column_names)
            fills = {
                c: _cast_pv(pv.get(phys[c]), types[c])
                for c in cols
                if c in part_cols
            }
            # an add carrying a deletion vector (shallow-clone v0 /
            # RESTORE re-add) enters the stream WITHOUT its dead rows
            dead = (
                set(deletion_vectors.read_dv(self.table, dv)) if dv else set()
            )
            for pos, batch in enumerate(t.to_pylist()):
                if pos in dead:
                    continue
                yield tuple(
                    fills[c] if c in fills
                    else (batch.get(phys[c]) if phys[c] in names else None)
                    for c in cols
                )

    def read(self, start: dict):
        from march_mania_spark_lakehouse_spark.sources import delta_log

        lo = int(start["version"])
        hi = delta_log.latest_version(self.table)
        if hi is None or hi <= lo:
            return (iter(()), {"version": lo})
        # materialized list, not a generator: Spark's runner pickles the
        # returned iterable for prefetch bookkeeping
        return (
            list(self._rows(self._added_files(lo, hi))),
            {"version": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        # restart replays bypass the prefetch cache and hand this value
        # straight to the runner, which requires an ITERATOR (lists fail
        # the DATA_SOURCE_INVALID_RETURN_TYPE check)
        return iter(
            list(
                self._rows(
                    self._added_files(
                        int(start["version"]), int(end["version"])
                    )
                )
            )
        )

    def commit(self, end: dict) -> None:
        pass  # committed versions are immutable — the log IS the ack


class DeltaTableStreamDataSource(DataSource):
    """``spark.readStream.format("delta_table_stream").option("path", t)``
    after registering: each micro-batch carries the rows appended to the
    Delta table since the checkpointed version."""

    @classmethod
    def name(cls) -> str:
        return "delta_table_stream"

    def schema(self):
        from pyspark.sql import types as T

        from march_mania_spark_lakehouse_spark.sources import delta_log

        base = delta_log.table_schema(self.options["path"])
        # strip columnMapping field metadata: physical names are a
        # reader-side concern, and metadata-bearing fields trip the
        # streaming sink's schema assertions
        return T.StructType(
            [T.StructField(f.name, f.dataType, f.nullable) for f in base.fields]
        )

    def simpleStreamReader(self, schema):  # noqa: ARG002 (API signature)
        return _DeltaTableStreamReader(self.options)


def _starting_mode(options: dict, key: str) -> str:
    """The CDC sources' expired-history policy (option ``key``):
    'earliest' (default) replays the full retained history and RAISES
    on an expired range; 'latest' starts a fresh checkpoint at the
    current high-water mark (no backfill); 'retained' re-bootstraps on
    expiry — when the next range is no longer replayable (log cleanup /
    expire_snapshots outran the checkpoint), the batch degrades to the
    FULL CURRENT SNAPSHOT tagged ``_change_type='bootstrap_insert'``
    and the stream continues from the head. Downstream state must treat
    a bootstrap batch as a RESET (replace, not merge) — that is the
    production recovery contract: rebuild from the snapshot, then
    resume incremental."""
    mode = (options.get(key) or "earliest").lower()
    if mode not in ("earliest", "latest", "retained"):
        raise ValueError(
            f"option {key} must be 'earliest', 'latest' or 'retained'; "
            f"got {mode!r}"
        )
    return mode


class _DeltaTableCdcStreamReader:
    """Row-level CDC micro-batches from a Delta table: appended rows as
    inserts, DELETION-VECTOR delete commits decomposed into the
    tombstoned rows as deletes (`_change_type` column) — the streaming
    twin of `delta_log.table_changes(include_deletes=True)` and the
    Delta mirror of `_IcebergTableCdcStreamReader`. A DV commit re-adds
    each touched file with a grown bitmap, so its deleted rows are the
    (new DV − predecessor DV) positions, recovered by reading ONLY the
    touched files. True rewrites (overwrite/MERGE/RESTORE) raise;
    OPTIMIZE commits (dataChange=false) are correctly invisible.
    Partitioned and column-mapped tables compose: partition columns
    restore from each add's partitionValues and files are read under
    their physical names — the streaming mirror of the batch scan's
    log-planned restoration. Driver-side pyarrow materialization is
    the documented SimpleDataSourceStreamReader trade."""

    def __init__(self, options: dict) -> None:
        self.table = options["path"]
        self.starting = _starting_mode(options, "starting_version")

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            from march_mania_spark_lakehouse_spark.sources import delta_log

            v = delta_log.latest_version(self.table)
            return {"version": -1 if v is None else v}
        return {"version": -1}

    def _bootstrap_rows(self, hi: int) -> list:
        """The re-bootstrap batch: every row live at version ``hi``
        (checkpoint-seeded replay + DV application), tagged
        'bootstrap_insert' — a downstream state RESET, not a merge."""
        import pyarrow.parquet as pq

        from march_mania_spark_lakehouse_spark.sources import (
            deletion_vectors,
            delta_log,
        )

        schema = delta_log.table_schema(self.table, hi)
        part_cols = set(delta_log.table_partition_columns(self.table, hi))
        mapping = delta_log.column_mapping(self.table, hi) or {}
        cols = [f.name for f in schema.fields]
        phys = {c: mapping.get(c, c) for c in cols}
        types = {f.name: f.dataType.simpleString() for f in schema.fields}
        rows = []
        for rel, add in sorted(delta_log._replay(self.table, hi).items()):
            t = pq.read_table(os.path.join(self.table, rel))
            names = set(t.column_names)
            pv = add.get("partitionValues") or {}
            fills = {
                c: _cast_pv(pv.get(phys[c]), types[c])
                for c in cols
                if c in part_cols
            }
            dv = add.get("deletionVector")
            dead = (
                set(deletion_vectors.read_dv(self.table, dv)) if dv else set()
            )
            for pos, rec in enumerate(t.to_pylist()):
                if pos in dead:
                    continue
                rows.append(
                    tuple(
                        fills[c] if c in fills
                        else (rec.get(phys[c]) if phys[c] in names else None)
                        for c in cols
                    )
                    + ("bootstrap_insert",)
                )
        return rows

    def _changes(self, lo: int, hi: int) -> list:
        import pyarrow.parquet as pq

        from march_mania_spark_lakehouse_spark.sources import (
            deletion_vectors,
            delta_log,
        )

        schema = delta_log.table_schema(self.table, hi)
        part_cols = set(delta_log.table_partition_columns(self.table, hi))
        mapping = delta_log.column_mapping(self.table, hi) or {}
        cols = [f.name for f in schema.fields]
        phys = {c: mapping.get(c, c) for c in cols}
        types = {f.name: f.dataType.simpleString() for f in schema.fields}
        dv_state: dict = (
            {
                p: a.get("deletionVector")
                for p, a in delta_log._replay(self.table, lo).items()
            }
            if lo >= 0
            else {}
        )
        added: list[tuple[str, dict, dict | None]] = []
        deleted: list[tuple[str, dict, dict, dict | None]] = []
        cdc_rels: list[str] = []
        for v in range(lo + 1, hi + 1):
            p = delta_log._commit_path(self.table, v)
            if not os.path.exists(p):
                raise FileNotFoundError(f"missing commit {v} for {self.table}")
            actions = delta_log._read_actions(p)
            removes = {
                a["remove"]["path"]
                for a in actions
                if "remove" in a and a["remove"].get("dataChange", True)
            }
            adds = [
                a["add"] for a in actions
                if "add" in a and a["add"].get("dataChange", True)
            ]
            cdc = [a["cdc"] for a in actions if "cdc" in a]
            if cdc:
                # explicit change files (delta.enableChangeDataFeed):
                # the spec rule — a commit WITH cdc actions feeds from
                # them alone (labels incl. update_pre/postimage were
                # written by the producing op); only the DV state
                # threads forward for later derived commits
                for a in adds:
                    dv_state[a["path"]] = a.get("deletionVector")
                cdc_rels.extend(c["path"] for c in cdc)
                continue
            if not removes:
                added.extend(
                    (
                        a["path"],
                        a.get("partitionValues") or {},
                        a.get("deletionVector"),
                    )
                    for a in adds
                )
                for a in adds:
                    dv_state[a["path"]] = a.get("deletionVector")
                continue
            readd = {a["path"]: a for a in adds}
            if set(readd) != removes or not all(
                a.get("deletionVector") for a in readd.values()
            ):
                raise delta_log.DeltaNonAppendChangeError(
                    f"commit {v} rewrites data files; a CDC stream "
                    "cannot represent it as row-level changes"
                )
            for path, a in readd.items():
                deleted.append(
                    (path, a.get("partitionValues") or {},
                     a["deletionVector"], dv_state.get(path))
                )
                dv_state[path] = a["deletionVector"]

        def _tuple(rec: dict, names: set, fills: dict) -> tuple:
            return tuple(
                fills[c] if c in fills
                else (rec.get(phys[c]) if phys[c] in names else None)
                for c in cols
            )

        def _fills(pv: dict) -> dict:
            return {
                c: _cast_pv(pv.get(phys[c]), types[c])
                for c in cols
                if c in part_cols
            }

        rows: list[tuple] = []
        for rel, pv, add_dv in sorted(added, key=lambda x: x[0]):
            t = pq.read_table(os.path.join(self.table, rel))
            names = set(t.column_names)
            fills = _fills(pv)
            # add-time tombstones (shallow-clone v0 / RESTORE re-add)
            # were dead before the file entered the feed: not inserts
            dead = (
                set(deletion_vectors.read_dv(self.table, add_dv))
                if add_dv
                else set()
            )
            for pos, rec in enumerate(t.to_pylist()):
                if pos in dead:
                    continue
                rows.append(_tuple(rec, names, fills) + ("insert",))
        for rel, pv, new_desc, old_desc in sorted(deleted, key=lambda x: x[0]):
            new_pos = set(deletion_vectors.read_dv(self.table, new_desc))
            old_pos = (
                set(deletion_vectors.read_dv(self.table, old_desc))
                if old_desc
                else set()
            )
            t = pq.read_table(os.path.join(self.table, rel))
            names = set(t.column_names)
            fills = _fills(pv)
            recs = t.to_pylist()
            for pos in sorted(new_pos - old_pos):
                rows.append(_tuple(recs[pos], names, fills) + ("delete",))
        for rel in sorted(cdc_rels):
            # change files carry ALL columns inline (partition columns
            # included) under physical names, plus _change_type
            t = pq.read_table(os.path.join(self.table, rel))
            names = set(t.column_names)
            for rec in t.to_pylist():
                rows.append(
                    tuple(
                        rec.get(phys[c]) if phys[c] in names else None
                        for c in cols
                    )
                    + (rec.get("_change_type"),)
                )
        return rows

    def _lineage_diff_rows(self, lo: int, hi: int) -> "list | None":
        """EXACT recovery across cleaned-up history via Delta ROW
        TRACKING (round 11, the Iceberg reader's twin): when a
        checkpoint was written AT the cursor version (checkpointing
        the cursor is how a caller keeps a stream resumable past
        `cleanup_log` — old checkpoint parquet survives cleanup), the
        emitted batch is the row-id diff between cursor and head —
        delete(old image) + insert(new image), exactly-once for the
        consumer. None when unrecoverable (no row tracking, no cursor
        checkpoint, or null-lineage rows) — the caller falls back to
        the 'bootstrap_insert' reset."""
        import pyarrow.parquet as pq

        from march_mania_spark_lakehouse_spark.sources import (
            deletion_vectors,
            delta_log,
        )

        if not delta_log._row_tracking_enabled(self.table, hi):
            return None
        old_live = delta_log.replay_at_checkpoint(self.table, lo)
        if old_live is None:
            # the non-append recovery path (round 12): the range's
            # commits are still READABLE (a RESTORE / overwrite raised
            # DeltaNonAppendChangeError, not log cleanup), so the
            # cursor state replays from the log directly
            try:
                old_live = delta_log._replay(self.table, lo)
            except FileNotFoundError:
                return None
        new_live = delta_log._replay(self.table, hi)
        schema = delta_log.table_schema(self.table, hi)
        part_cols = set(delta_log.table_partition_columns(self.table, hi))
        mapping = delta_log.column_mapping(self.table, hi) or {}
        cols = [f.name for f in schema.fields]
        phys = {c: mapping.get(c, c) for c in cols}
        types = {f.name: f.dataType.simpleString() for f in schema.fields}

        def rows_of(live) -> "dict | None":
            out: dict = {}
            for rel, add in sorted(live.items()):
                p = rel if os.path.isabs(rel) else os.path.join(
                    self.table, rel
                )
                try:
                    t = pq.read_table(p)
                except FileNotFoundError:
                    # a cursor-side file removed AND vacuumed between
                    # cursor and head: the old image is unknowable —
                    # signal unrecoverable so the caller falls back to
                    # the bootstrap reset (which reads head files only)
                    return None
                names = set(t.column_names)
                pv = add.get("partitionValues") or {}
                fills = {
                    c: _cast_pv(pv.get(phys[c]), types[c])
                    for c in cols
                    if c in part_cols
                }
                dv = add.get("deletionVector")
                dead = (
                    set(deletion_vectors.read_dv(self.table, dv))
                    if dv
                    else set()
                )
                base = add.get("baseRowId")
                dcv = add.get("defaultRowCommitVersion")
                mat_id = "_row_id" in names
                mat_rcv = "_row_commit_version" in names
                for pos, rec in enumerate(t.to_pylist()):
                    if pos in dead:
                        continue
                    rid = rec.get("_row_id") if mat_id else None
                    if rid is None and base is not None:
                        rid = base + pos
                    if rid is None:
                        return None  # pre-enable file: refuse
                    rcv = rec.get("_row_commit_version") if mat_rcv else None
                    if rcv is None:
                        rcv = dcv
                    if rcv is None:
                        return None  # id without a version clock: refuse
                    out[rid] = (
                        rcv,
                        tuple(
                            fills[c] if c in fills
                            else (rec.get(phys[c]) if phys[c] in names else None)
                            for c in cols
                        ),
                    )
            return out

        old_by = rows_of(old_live)
        if old_by is None:
            return None
        new_by = rows_of(new_live)
        if new_by is None:
            return None
        rows = []
        for rid, (rcv, vals) in sorted(old_by.items()):
            if rid not in new_by or new_by[rid][0] > rcv:
                rows.append(vals + ("delete",))
        for rid, (rcv, vals) in sorted(new_by.items()):
            if rid not in old_by or rcv > old_by[rid][0]:
                rows.append(vals + ("insert",))
        return rows

    def _refuse_id_mapping(self, hi: int) -> None:
        from march_mania_spark_lakehouse_spark.sources import delta_log

        md = delta_log._latest_metadata(self.table, hi)
        if (md.get("configuration") or {}).get(
            "delta.columnMapping.mode"
        ) == "id":
            raise NotImplementedError(
                "delta_table_cdc on a columnMapping.mode=id table: this "
                "driver-side reader resolves columns by physical name; "
                "read the table in batch (read_delta handles id "
                "resolution)"
            )

    def read(self, start: dict):
        from march_mania_spark_lakehouse_spark.sources import delta_log

        lo = int(start["version"])
        hi = delta_log.latest_version(self.table)
        if hi is None or hi <= lo:
            return (iter(()), {"version": lo})
        self._refuse_id_mapping(hi)
        from march_mania_spark_lakehouse_spark.sources.delta_log import (
            DeltaNonAppendChangeError,
        )

        try:
            return (self._changes(lo, hi), {"version": hi})
        except (FileNotFoundError, DeltaNonAppendChangeError):
            # commits in (lo, hi] were cleaned up past the checkpoint,
            # OR a commit rewrites data files (RESTORE / overwrite)
            # that the per-commit walk cannot decompose — with row
            # tracking the resumed batch is the EXACT state diff
            # cursor→head (delete/insert, update pre/post images), the
            # same vocabulary, net-exact for the consumer
            if self.starting != "retained":
                raise
            diff = self._lineage_diff_rows(lo, hi)
            if diff is not None:
                return (diff, {"version": hi})
            return (self._bootstrap_rows(hi), {"version": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        # iter(): restart replays hand this straight to the runner,
        # which requires an ITERATOR
        from march_mania_spark_lakehouse_spark.sources.delta_log import (
            DeltaNonAppendChangeError,
        )

        try:
            return iter(
                self._changes(int(start["version"]), int(end["version"]))
            )
        except (FileNotFoundError, DeltaNonAppendChangeError):
            if self.starting != "retained":
                raise
            diff = self._lineage_diff_rows(
                int(start["version"]), int(end["version"])
            )
            if diff is not None:
                return iter(diff)
            return iter(self._bootstrap_rows(int(end["version"])))

    def commit(self, end: dict) -> None:
        pass  # committed versions are immutable — the log IS the ack


class DeltaTableCdcStreamDataSource(DataSource):
    """``spark.readStream.format("delta_table_cdc").option("path", t)``
    after registering: micro-batches carry the table's row-level
    changes (insert/delete in `_change_type`) since the checkpointed
    version — DV DELETE commits flow as signed delete rows, so
    `ivm.signed_state` materialized views refresh through merge-on-read
    deletes exactly once, the same loop the Iceberg CDC source drives.
    Option ``starting_version``: 'earliest' (default — full retained
    history, raises on expiry OR on a commit the per-commit walk
    cannot decompose: RESTORE / overwrite), 'latest' (fresh
    checkpoints start at the head), or 'retained' — an expired range
    or a non-decomposable commit recovers: with ROW TRACKING the
    resumed batch is the EXACT state diff cursor→head (round 12 —
    a mid-stream RESTORE retracts precisely), else the full current
    snapshot re-emits tagged 'bootstrap_insert' (a downstream state
    reset; see `_starting_mode`)."""

    @classmethod
    def name(cls) -> str:
        return "delta_table_cdc"

    def schema(self):
        from pyspark.sql import types as T

        from march_mania_spark_lakehouse_spark.sources import delta_log

        base = delta_log.table_schema(self.options["path"])
        # metadata stripped for the same reason as the append source
        return T.StructType(
            [T.StructField(f.name, f.dataType, f.nullable) for f in base.fields]
            + [T.StructField("_change_type", T.StringType(), False)]
        )

    def simpleStreamReader(self, schema):  # noqa: ARG002 (API signature)
        return _DeltaTableCdcStreamReader(self.options)


# --------------------------------------------------------------------------
# Streaming FROM an Iceberg-format table — the `delta_table_stream`
# pattern on the second lake format: offsets are table SEQUENCE NUMBERS
# (monotone per commit), a micro-batch is the data files whose manifest
# entries carry sequence numbers in (checkpointed, latest], and replay
# is deterministic because committed snapshots are immutable. Append-
# only contract: a rewrite snapshot (overwrite/MERGE) in the range
# raises rather than double-counting. Partitioned tables compose:
# identity partition columns restore from the manifest entries' TYPED
# partition tuples (transform fields need nothing — hidden
# partitioning keeps their source columns in the files).
# --------------------------------------------------------------------------


def _iceberg_partition_value(v, type_name: str):
    """Manifest partition tuples carry TYPED Avro values; convert the
    spec's surrogate encodings (date = days-since-epoch int,
    timestamptz = micros-since-epoch long) back to Python values."""
    import datetime

    if v is None:
        return None
    if type_name == "date":
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v))
    if type_name in ("timestamp", "timestamptz"):
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=int(v)
        )
    if type_name.startswith("decimal"):
        import decimal
        import re

        m = re.match(r"decimal\((\d+),\s*(-?\d+)\)", type_name)
        d = decimal.Decimal(v)
        if m:
            d = d.quantize(decimal.Decimal(1).scaleb(-int(m.group(2))))
        return d
    return v


class _IcebergTableStreamReader:
    def __init__(self, options: dict) -> None:
        self.table = options["path"]

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _added_files(self, lo: int, hi: int) -> list:
        from march_mania_spark_lakehouse_spark.sources import iceberg

        meta = iceberg.current_metadata(self.table)
        # per-snapshot planning (iceberg.change_feed_entries): replace
        # (compaction) snapshots are skipped — zero logical rows — and
        # each commit's files come from its OWN manifest list, so a
        # later OPTIMIZE can neither break the stream nor hide in-range
        # appends; non-append row-changing commits and expired ranges
        # raise as before
        entries = iceberg.change_feed_entries(
            meta, lo, hi, ("append",), err=ValueError
        )
        return sorted(
            (e["data_file"]["file_path"], e["data_file"].get("partition") or {})
            for e in entries
            if e["data_file"].get("content", 0) == 0
        )

    def _rows(self, files: list):
        import pyarrow.parquet as pq

        from march_mania_spark_lakehouse_spark.sources import iceberg

        meta = iceberg.current_metadata(self.table)
        schema = meta["schemas"][meta["current-schema-id"]]
        cols = [f["name"] for f in schema["fields"]]
        # identity-transform partition columns are physically absent
        # from data files (hive layout); their TYPED values ride in the
        # manifest entry's partition tuple — restore from there, PER
        # ENTRY (after a repartition_table the identity set differs per
        # generation; a schema column present in the tuple is an
        # identity value by construction). Transform fields (ts_day /
        # key_bucket) need nothing: their source columns stay in the
        # files (hidden partitioning).
        for path, part in files:
            t = pq.read_table(path)
            names = set(t.column_names)
            fills = {
                c: _iceberg_partition_value(part.get(c), ty)
                for c, ty in (
                    (f["name"], f["type"]) for f in schema["fields"]
                )
                if c in part
            }
            for rec in t.to_pylist():
                yield tuple(
                    fills[c] if c in fills
                    else (rec.get(c) if c in names else None)
                    for c in cols
                )

    def read(self, start: dict):
        from march_mania_spark_lakehouse_spark.sources import iceberg

        lo = int(start["seq"])
        if iceberg.current_version(self.table) is None:
            return (iter(()), {"seq": lo})
        hi = iceberg.current_metadata(self.table)["last-sequence-number"]
        if hi <= lo:
            return (iter(()), {"seq": lo})
        return (list(self._rows(self._added_files(lo, hi))), {"seq": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        # iter(): restart replays hand this straight to the runner,
        # which requires an ITERATOR
        return iter(
            list(self._rows(self._added_files(int(start["seq"]), int(end["seq"]))))
        )

    def commit(self, end: dict) -> None:
        pass  # committed snapshots are immutable — the metadata IS the ack


class IcebergTableStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_table_stream").option("path", t)``
    after registering: each micro-batch carries the rows appended to the
    Iceberg table since the checkpointed sequence number."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_table_stream"

    def schema(self):
        from pyspark.sql import types as T

        from march_mania_spark_lakehouse_spark.sources import iceberg

        meta = iceberg.current_metadata(self.options["path"])
        schema = meta["schemas"][meta["current-schema-id"]]
        return T.StructType(
            [T.StructField(f["name"], _iceberg_spark_type(f["type"]), True)
             for f in schema["fields"]]
        )

    def simpleStreamReader(self, schema):  # noqa: ARG002 (API signature)
        return _IcebergTableStreamReader(self.options)


class _IcebergTableCdcStreamReader:
    """Row-level CDC micro-batches from an Iceberg table: appended rows
    as inserts, merge-on-read position-delete commits decomposed into
    the tombstoned rows as deletes (`_change_type` column), and —
    round 8 — EQUALITY-delete commits (the Flink-style upsert shape)
    decomposed the way batch `iceberg.table_changes` does: each
    commit's dead rows are the rows alive at its PARENT snapshot
    matching the delete file's key tuples null-safe, recovered by
    replanning the parent snapshot inside the batch planner (strictly-
    lower-sequence rule holds for free: every parent-live data file
    precedes the delete commit). An `upsert` history therefore streams
    as delete(old) + insert(new) — the streaming twin of
    `iceberg.table_changes(include_deletes=True)`. Identity partition
    columns restore from the manifest partition tuples (the
    append-only reader's rule); driver-side pyarrow materialization is
    the documented SimpleDataSourceStreamReader trade."""

    def __init__(self, options: dict) -> None:
        self.table = options["path"]
        self.starting = _starting_mode(options, "starting_sequence")

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            from march_mania_spark_lakehouse_spark.sources import iceberg

            if iceberg.current_version(self.table) is None:
                return {"seq": 0}
            meta = iceberg.current_metadata(self.table)
            return {
                "seq": meta["last-sequence-number"],
                "sid": meta.get("current-snapshot-id", -1),
            }
        return {"seq": 0}

    def _ancestry(self, meta: dict) -> "tuple[dict, set, set]":
        """(id → snapshot, main-ancestry ids, main-ancestry seqs)."""
        by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
        anc: set = set()
        node = meta.get("current-snapshot-id", -1)
        while node in by_id:
            anc.add(node)
            node = by_id[node].get("parent-snapshot-id", -1)
        return by_id, anc, {by_id[i]["sequence-number"] for i in anc}

    def _cursor_snap(self, meta: dict, lo: int, sid, by_id: dict):
        """The retained snapshot whose state the consumer holds, or
        None. Offsets checkpoint the exact snapshot id (round 12); a
        legacy sid-less cursor resolves by unique sequence number,
        accepted only when the snapshot was once main (snapshot-log
        membership) — a staged branch snapshot's state was never the
        stream's."""
        if sid is not None:
            return by_id.get(sid)
        s_lo = next(
            (s for s in meta["snapshots"] if s["sequence-number"] == lo),
            None,
        )
        if s_lo is None:
            return None
        log_ids = {
            e["snapshot-id"] for e in meta.get("snapshot-log", [])
        }
        return s_lo if s_lo["snapshot-id"] in log_ids else None

    def _live_rows(self, meta: dict, snap: dict) -> list:
        """Live rows at ``snap`` as [(values tuple, _row_id, _lus)] —
        position deletes, deletion vectors, and the strictly-lower
        equality-delete rule applied driver-side; lineage resolved per
        `iceberg.read_lineage`'s rule (materialized columns override
        entry-level ``first_row_id`` inheritance; a pre-upgrade file
        yields None)."""
        import pyarrow.parquet as pq

        from march_mania_spark_lakehouse_spark.sources import avro_ocf, iceberg

        schema = meta["schemas"][meta["current-schema-id"]]
        cols = [f["name"] for f in schema["fields"]]
        types = {f["name"]: f["type"] for f in schema["fields"]}
        by_fid = {f["id"]: f["name"] for f in schema["fields"]}
        datafiles: dict = {}  # path -> (eseq, fseq, first_row_id, part)
        tomb: dict = {}  # path -> set(dead positions)
        eq: list = []  # (seq, key cols, keyset)
        pos_files: list = []
        for m in avro_ocf.read_ocf(snap["manifest-list"]):
            for e in avro_ocf.read_ocf(m["manifest_path"]):
                if e["status"] == 2:
                    continue
                d = e["data_file"]
                c = d.get("content", 0)
                if c == 0:
                    datafiles[d["file_path"]] = (
                        e["sequence_number"],
                        e.get("file_sequence_number")
                        or e["sequence_number"],
                        d.get("first_row_id"),
                        d.get("partition") or {},
                    )
                elif c == 1:
                    if (d.get("file_format") or "").upper() == "PUFFIN":
                        tomb.setdefault(
                            d["referenced_data_file"], set()
                        ).update(
                            iceberg.read_dv_blob(
                                d["file_path"],
                                d["content_offset"],
                                d["content_size_in_bytes"],
                            )
                        )
                    else:
                        pos_files.append(d["file_path"])
                else:
                    kcols = [by_fid[i] for i in d.get("equality_ids") or []]
                    keyset = {
                        tuple(r.get(kc) for kc in kcols)
                        for r in pq.read_table(
                            d["file_path"], columns=kcols
                        ).to_pylist()
                    }
                    eq.append((e["sequence_number"], kcols, keyset))
        for p in sorted(pos_files):
            t = pq.read_table(p)
            for fp, pos in zip(
                t.column("file_path").to_pylist(), t.column("pos").to_pylist()
            ):
                tomb.setdefault(fp, set()).add(pos)
        rows = []
        for fp in sorted(datafiles):
            dseq, fseq, first, part = datafiles[fp]
            t = pq.read_table(fp)
            names = set(t.column_names)
            # per-entry tuple, not the current identity set: after a
            # repartition_table the identity set differs per generation
            fills = {
                c: _iceberg_partition_value(part.get(c), types[c])
                for c in cols
                if c in part
            }
            gone = tomb.get(fp, ())
            for pos, rec in enumerate(t.to_pylist()):
                if pos in gone:
                    continue
                vals = {
                    c: fills[c] if c in fills
                    else (rec.get(c) if c in names else None)
                    for c in cols
                }
                if any(
                    dseq < s and tuple(vals.get(c) for c in kc) in ks
                    for s, kc, ks in eq
                ):
                    continue
                rid = rec.get("_row_id") if "_row_id" in names else None
                if rid is None and first is not None:
                    rid = first + pos
                lus = None
                if rid is not None:
                    lus = (
                        rec.get("_last_updated_sequence_number")
                        if "_last_updated_sequence_number" in names
                        else None
                    )
                    if lus is None:
                        lus = fseq
                rows.append((tuple(vals[c] for c in cols), rid, lus))
        return rows

    def _bootstrap_rows(self, meta: dict) -> list:
        """The re-bootstrap batch: every row live at the CURRENT
        snapshot, tagged 'bootstrap_insert' — a downstream state
        RESET."""
        from march_mania_spark_lakehouse_spark.sources import iceberg

        sid = meta["current-snapshot-id"]
        if sid == -1:
            return []
        snap = iceberg._snapshot(meta, sid)
        return [
            vals + ("bootstrap_insert",)
            for vals, _, _ in self._live_rows(meta, snap)
        ]

    def _lineage_diff_rows(self, meta: dict, lo: int, hi: int) -> "list | None":
        """EXACT recovery across expired history via v3 row lineage
        (round 11): when the cursor's snapshot itself is still retained
        (tagged/branched through `expire_snapshots`, the resumable-
        stream pattern) the emitted batch is the lineage DIFF between
        cursor and head — delete(old image) + insert(new image), the
        stream's own vocabulary, costing two snapshot reads instead of
        a full-state 'bootstrap_insert' RESET, and exactly-once for the
        consumer (no state discard). Returns None when unrecoverable
        (v2 table, cursor snapshot expired, or null-lineage rows) — the
        caller falls back to the bootstrap reset."""
        if int(meta.get("format-version", 2)) < 3:
            return None
        # endpoint resolution must never pick a staged WAP / branch
        # snapshot (its state is not the main table's): the NEW side
        # must sit on the head's ancestry; the OLD side is either on
        # that ancestry or named by a TAG ref (the documented
        # cursor-retention pattern — expiry breaks the parent chain,
        # so the tagged cursor is only reachable directly). A branch
        # HEAD at the cursor sequence falls through to the bootstrap.
        by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
        main: dict = {}
        node = meta.get("current-snapshot-id", -1)
        while node in by_id:
            s = by_id[node]
            main[s["sequence-number"]] = s
            node = s.get("parent-snapshot-id", -1)
        tag_ids = {
            r["snapshot-id"]
            for r in (meta.get("refs") or {}).values()
            if r.get("type") == "tag"
        }
        old_snap = main.get(lo) or next(
            (
                s
                for s in meta["snapshots"]
                if s["sequence-number"] == lo
                and s["snapshot-id"] in tag_ids
            ),
            None,
        )
        new_snap = main.get(hi)
        if (
            old_snap is None
            or new_snap is None
            or not os.path.exists(old_snap["manifest-list"])
            or not os.path.exists(new_snap["manifest-list"])
        ):
            return None
        old = self._live_rows(meta, old_snap)
        new = self._live_rows(meta, new_snap)
        if any(rid is None for _, rid, _ in old) or any(
            rid is None for _, rid, _ in new
        ):
            return None  # pre-upgrade rows: identity-keyed diff refuses
        return self._rid_diff(old, new)

    @staticmethod
    def _rid_diff(old: list, new: list) -> list:
        """delete/insert batch between two [(vals, rid, lus)] states,
        keyed by row id (updates emit pre- and post-image)."""
        old_by = {rid: (lus, vals) for vals, rid, lus in old}
        new_by = {rid: (lus, vals) for vals, rid, lus in new}
        rows = []
        for rid, (lus, vals) in sorted(old_by.items()):
            if rid not in new_by:
                rows.append(vals + ("delete",))
            elif new_by[rid][0] > lus:
                rows.append(vals + ("delete",))  # update pre-image
        for rid, (lus, vals) in sorted(new_by.items()):
            if rid not in old_by:
                rows.append(vals + ("insert",))
            elif lus > old_by[rid][0]:
                rows.append(vals + ("insert",))  # update post-image
        return rows

    def _state_diff_rows(self, meta: dict, old_snap: dict, new_snap: dict) -> list:
        """EXACT retraction/insertion batch between two RETAINED
        snapshots — the non-linear-history recovery (round 12): when
        the consumer's cursor snapshot was rolled off the main
        ancestry (`rollback_to_snapshot`, or a fast-forward past one),
        the emitted batch is the state diff cursor→head, so the
        consumer's net state reconverges without a reset. Row-lineage
        keyed when every row carries an id (v3, exactly-once update
        pre/post images); value-multiset keyed otherwise — still an
        exact net diff, the delete/insert vocabulary needs no ids."""
        old = self._live_rows(meta, old_snap)
        new = self._live_rows(meta, new_snap)
        if (
            int(meta.get("format-version", 2)) >= 3
            and all(rid is not None for _, rid, _ in old)
            and all(rid is not None for _, rid, _ in new)
        ):
            return self._rid_diff(old, new)
        from collections import Counter

        oc = Counter(vals for vals, _, _ in old)
        nc = Counter(vals for vals, _, _ in new)
        rows = []
        for vals, n in sorted((oc - nc).items(), key=repr):
            rows.extend([vals + ("delete",)] * n)
        for vals, n in sorted((nc - oc).items(), key=repr):
            rows.extend([vals + ("insert",)] * n)
        return rows

    def _changes(self, lo: int, hi: int) -> list:
        import pyarrow.parquet as pq

        from march_mania_spark_lakehouse_spark.sources import avro_ocf, iceberg

        meta = iceberg.current_metadata(self.table)
        snap = iceberg._snapshot(meta, meta["current-snapshot-id"])
        schema = meta["schemas"][meta["current-schema-id"]]
        cols = [f["name"] for f in schema["fields"]]
        types = {f["name"]: f["type"] for f in schema["fields"]}
        by_fid = {f["id"]: f["name"] for f in schema["fields"]}
        added, pos_dels = [], []
        eq_by_seq: dict = {}  # commit seq -> [(path, equality col names)]
        part_of: dict = {}  # data file path -> partition tuple
        for m in avro_ocf.read_ocf(snap["manifest-list"]):
            for e in avro_ocf.read_ocf(m["manifest_path"]):
                d = e["data_file"]
                if d.get("content", 0) == 0:
                    # remember EVERY live data file's partition tuple —
                    # a delete in range can tombstone rows of a file
                    # added before the range
                    part_of[d["file_path"]] = d.get("partition") or {}
        # per-snapshot planning (iceberg.change_feed_entries): replace
        # (compaction) snapshots skip — zero logical rows — so routine
        # OPTIMIZE never kills the CDC stream, and each commit's files
        # come from its OWN manifest list (a later rewrite cannot hide
        # them); row-changing rewrites and expired ranges still raise
        dv_by_seq: dict = {}  # commit seq -> [DV data_file dicts] (v3)
        for e in iceberg.change_feed_entries(
            meta, lo, hi, ("append", "delete"), err=ValueError
        ):
            d = e["data_file"]
            content = d.get("content", 0)
            if content == 0:
                added.append(d["file_path"])
                # the file may have been compacted OUT of the current
                # snapshot — its partition tuple still comes from the
                # in-range entry itself
                part_of.setdefault(d["file_path"], d.get("partition") or {})
            elif content == 1:
                if (d.get("file_format") or "").upper() == "PUFFIN":
                    dv_by_seq.setdefault(e["sequence_number"], []).append(d)
                else:
                    pos_dels.append(d["file_path"])
            else:  # content == 2: equality delete (upsert CDC)
                eq_by_seq.setdefault(e["sequence_number"], []).append(
                    (
                        d["file_path"],
                        [by_fid[i] for i in d.get("equality_ids") or []],
                    )
                )

        def _fills(path: str) -> dict:
            # fill from THIS entry's partition tuple (generation-proof:
            # after a repartition_table the identity set differs across
            # generations — a schema column present in the tuple is an
            # identity value by construction, transform field names
            # never collide with schema columns); files whose tuple
            # lacks the column carry it physically
            part = part_of.get(path) or {}
            return {
                c: _iceberg_partition_value(part.get(c), types[c])
                for c in cols
                if c in part
            }

        rows = []
        for path in sorted(added):
            t = pq.read_table(path)
            names = set(t.column_names)
            fills = _fills(path)
            for rec in t.to_pylist():
                rows.append(
                    tuple(
                        fills[c] if c in fills
                        else (rec.get(c) if c in names else None)
                        for c in cols
                    )
                    + ("insert",)
                )
        tomb: dict = {}
        for path in sorted(pos_dels):
            t = pq.read_table(path)
            for fp, pos in zip(
                t.column("file_path").to_pylist(), t.column("pos").to_pylist()
            ):
                tomb.setdefault(fp, set()).add(pos)
        # v3 deletion vectors: this commit's kills are the new DV's
        # positions MINUS the parent snapshot's DV positions for the
        # same file (a DV replaces its predecessor, never chains)
        for s in sorted(dv_by_seq):
            snap_s = next(
                (x for x in meta["snapshots"] if x["sequence-number"] == s),
                None,
            )
            parent = snap_s.get("parent-snapshot-id") if snap_s else None
            parent_dvs = {
                e["referenced_data_file"]: e
                for e in (
                    iceberg.snapshot_dv_entries(self.table, parent)
                    if parent is not None
                    else []
                )
            }
            for d in dv_by_seq[s]:
                ref = d["referenced_data_file"]
                pos = set(
                    iceberg.read_dv_blob(
                        d["file_path"],
                        d["content_offset"],
                        d["content_size_in_bytes"],
                    )
                )
                old = parent_dvs.get(ref)
                if old is not None:
                    pos -= set(
                        iceberg.read_dv_blob(
                            old["puffin_path"], old["offset"], old["length"]
                        )
                    )
                if pos:
                    tomb.setdefault(ref, set()).update(pos)
        for fp in sorted(tomb):
            t = pq.read_table(fp)
            names = set(t.column_names)
            fills = _fills(fp)
            recs = t.to_pylist()
            for pos in sorted(tomb[fp]):
                rec = recs[pos]
                rows.append(
                    tuple(
                        fills[c] if c in fills
                        else (rec.get(c) if c in names else None)
                        for c in cols
                    )
                    + ("delete",)
                )
        for s in sorted(eq_by_seq):
            rows.extend(
                self._eq_dead_rows(
                    meta, s, eq_by_seq[s], cols, types
                )
            )
        return rows

    def _eq_dead_rows(
        self, meta: dict, del_seq: int, files: list, cols: list,
        types: dict,
    ) -> list:
        """Rows an equality-delete commit killed: alive at the commit's
        PARENT snapshot, matching any delete file's key tuples —
        null-safe via Python tuple equality (None == None matches, the
        spec rule). Every data file live at the parent has a sequence
        number < del_seq, so the strictly-lower ordering rule holds by
        construction. Mirrors the batch `iceberg.table_changes`
        decomposition with this reader's driver-side pyarrow
        materialization: the parent's OWN deletes (position and
        earlier equality tombstones) are applied first, so rows already
        dead before this commit are never re-emitted."""
        import pyarrow.parquet as pq

        from march_mania_spark_lakehouse_spark.sources import avro_ocf, iceberg

        del_snap = next(
            (s for s in meta["snapshots"] if s["sequence-number"] == del_seq),
            None,
        )
        if del_snap is None:
            # the delete commit's snapshot was expired while its
            # manifest entry survives in the current manifest list —
            # same recovery story as a missing parent snapshot
            raise ValueError(
                f"snapshot of the equality-delete commit at seq {del_seq} "
                "was expired; its pre-image rows are unrecoverable"
            )
        parent_id = del_snap.get("parent-snapshot-id")
        if parent_id is None:
            return []  # delete against an empty table: nothing to kill
        try:
            psnap = iceberg._snapshot(meta, parent_id)
        except KeyError:
            raise ValueError(
                f"parent snapshot {parent_id} of the equality-delete "
                f"commit at seq {del_seq} was expired; its pre-image "
                "rows are unrecoverable"
            )
        schema = meta["schemas"][
            psnap.get("schema-id", meta["current-schema-id"])
        ]
        pby_fid = {f["id"]: f["name"] for f in schema["fields"]}
        datafiles: dict = {}  # path -> (seq, partition tuple)
        pos_files: list = []
        dv_tomb: dict = {}  # path -> set(positions) from parent v3 DVs
        parent_eq: list = []  # (seq, cols, path)
        for m in avro_ocf.read_ocf(psnap["manifest-list"]):
            for e in avro_ocf.read_ocf(m["manifest_path"]):
                if e["status"] == 2:
                    continue
                d = e["data_file"]
                c = d.get("content", 0)
                if c == 0:
                    datafiles[d["file_path"]] = (
                        e["sequence_number"], d.get("partition") or {}
                    )
                elif c == 1:
                    if (d.get("file_format") or "").upper() == "PUFFIN":
                        # parent carries v3 deletion vectors: decode
                        # the blob, never pq.read_table a Puffin file
                        dv_tomb.setdefault(
                            d["referenced_data_file"], set()
                        ).update(
                            iceberg.read_dv_blob(
                                d["file_path"],
                                d["content_offset"],
                                d["content_size_in_bytes"],
                            )
                        )
                    else:
                        pos_files.append(d["file_path"])
                else:
                    parent_eq.append(
                        (
                            e["sequence_number"],
                            [pby_fid[i] for i in d.get("equality_ids") or []],
                            d["file_path"],
                        )
                    )
        tomb: dict = dv_tomb
        for p in sorted(pos_files):
            t = pq.read_table(p)
            for fp, pos in zip(
                t.column("file_path").to_pylist(), t.column("pos").to_pylist()
            ):
                tomb.setdefault(fp, set()).add(pos)

        def _keyset(path: str, kcols: list) -> set:
            return {
                tuple(r.get(c) for c in kcols)
                for r in pq.read_table(path, columns=kcols).to_pylist()
            }

        kill = [(kcols, _keyset(p, kcols)) for p, kcols in files]
        dead_before = [
            (s, kcols, _keyset(p, kcols)) for s, kcols, p in parent_eq
        ]
        out = []
        for fp in sorted(datafiles):
            dseq, part = datafiles[fp]
            t = pq.read_table(fp)
            names = set(t.column_names)
            fills = {
                c: _iceberg_partition_value(part.get(c), types[c])
                for c in cols
                if c in part
            }
            gone = tomb.get(fp, ())
            for pos, rec in enumerate(t.to_pylist()):
                if pos in gone:
                    continue
                vals = {
                    c: fills[c] if c in fills
                    else (rec.get(c) if c in names else None)
                    for c in cols
                }
                if any(
                    dseq < s and tuple(vals.get(c) for c in kc) in ks
                    for s, kc, ks in dead_before
                ):
                    continue  # already dead before this commit
                if any(
                    tuple(vals.get(c) for c in kc) in ks for kc, ks in kill
                ):
                    out.append(tuple(vals[c] for c in cols) + ("delete",))
        return out

    def read(self, start: dict):
        from march_mania_spark_lakehouse_spark.sources import iceberg

        lo = int(start["seq"])
        sid = start.get("sid")
        if iceberg.current_version(self.table) is None:
            return (iter(()), dict(start))
        meta = iceberg.current_metadata(self.table)
        hi = meta["last-sequence-number"]
        by_id, anc_ids, anc_seqs = self._ancestry(meta)
        head_id = meta.get("current-snapshot-id", -1)
        # non-linear history first (round 12): a cursor whose snapshot
        # is no longer on the head's ancestry (rollback_to_snapshot /
        # fast-forward past one) must NOT continue the linear walk —
        # that silently skips the retractions. This fires even when the
        # sequence high-water mark did not move (a bare rollback).
        linear = lo == 0 or (
            sid in anc_ids if sid is not None else lo in anc_seqs
        )
        if not linear:
            old_snap = self._cursor_snap(meta, lo, sid, by_id)
            new_off = {"seq": hi, "sid": head_id}
            if (
                old_snap is not None
                and head_id in by_id
                and os.path.exists(old_snap["manifest-list"])
            ):
                return (
                    self._state_diff_rows(meta, old_snap, by_id[head_id]),
                    new_off,
                )
            if self.starting == "retained":
                return (self._bootstrap_rows(meta), new_off)
            raise ValueError(
                "the cursor snapshot was rolled off the main ancestry "
                "and is no longer retained; the retraction batch is "
                "unknowable — restart with starting_sequence='retained'"
            )
        if hi <= lo:
            return (iter(()), dict(start))
        try:
            return (self._changes(lo, hi), {"seq": hi, "sid": head_id})
        except ValueError:
            # snapshots in (lo, hi] were expired past the checkpoint
            if self.starting != "retained":
                raise
            diff = self._lineage_diff_rows(meta, lo, hi)
            if diff is not None:
                return (diff, {"seq": hi, "sid": head_id})
            return (self._bootstrap_rows(meta), {"seq": hi, "sid": head_id})

    def readBetweenOffsets(self, start: dict, end: dict):
        # iter(): restart replays hand this straight to the runner,
        # which requires an ITERATOR
        from march_mania_spark_lakehouse_spark.sources import iceberg

        s_sid, e_sid = start.get("sid"), end.get("sid")
        if s_sid is not None and e_sid is not None and s_sid != e_sid:
            meta = iceberg.current_metadata(self.table)
            by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
            anc: set = set()
            node = e_sid
            while node in by_id:
                anc.add(node)
                node = by_id[node].get("parent-snapshot-id", -1)
            if s_sid not in anc:
                # replay of a compensating (non-linear) batch: the
                # exact diff between the two checkpointed snapshots
                old_snap, new_snap = by_id.get(s_sid), by_id.get(e_sid)
                if (
                    old_snap is not None
                    and new_snap is not None
                    and os.path.exists(old_snap["manifest-list"])
                    and os.path.exists(new_snap["manifest-list"])
                ):
                    return iter(
                        self._state_diff_rows(meta, old_snap, new_snap)
                    )
                if self.starting == "retained":
                    return iter(self._bootstrap_rows(meta))
                raise ValueError(
                    "cannot replay the compensating batch: one of its "
                    "endpoint snapshots is no longer retained"
                )
        try:
            return iter(self._changes(int(start["seq"]), int(end["seq"])))
        except ValueError:
            if self.starting != "retained":
                raise
            meta = iceberg.current_metadata(self.table)
            diff = self._lineage_diff_rows(
                meta, int(start["seq"]), int(end["seq"])
            )
            if diff is not None:
                return iter(diff)
            return iter(self._bootstrap_rows(meta))

    def commit(self, end: dict) -> None:
        pass


class IcebergTableCdcStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_table_cdc").option("path", t)``
    after registering: micro-batches carry the table's row-level
    changes (insert/delete in `_change_type`) since the checkpointed
    sequence number — feed them to `ivm.signed_state` and a streaming
    materialized view refreshes through merge-on-read DELETEs.
    Option ``starting_sequence``: 'earliest' (default — full retained
    history, raises on expiry), 'latest' (fresh checkpoints start at
    the head), or 'retained' (an expired range re-bootstraps as the
    full current snapshot tagged 'bootstrap_insert' — a downstream
    state reset; see `_starting_mode`)."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_table_cdc"

    def schema(self):
        from pyspark.sql import types as T

        from march_mania_spark_lakehouse_spark.sources import iceberg

        meta = iceberg.current_metadata(self.options["path"])
        schema = meta["schemas"][meta["current-schema-id"]]
        return T.StructType(
            [T.StructField(f["name"], _iceberg_spark_type(f["type"]), True)
             for f in schema["fields"]]
            + [T.StructField("_change_type", T.StringType(), False)]
        )

    def simpleStreamReader(self, schema):  # noqa: ARG002 (API signature)
        return _IcebergTableCdcStreamReader(self.options)
