"""Lake-maintenance operations: compaction and versioned snapshots.

The two table-maintenance jobs a parquet lake runs that the reference
(one-shot Kaggle pipeline, `jobs/01..12`) never needed but a continuously
ingested 100 TB lake cannot live without:

- **compaction** — streaming/micro-batch ingest leaves thousands of
  small files; scan cost is per-file (open + footer + seek), so a
  1000-file-of-1MB table reads ~10× slower than 8 files of 128 MB.
  `compact` rewrites a directory to ~target-sized files in one
  scan+shuffle-free write (coalesce, not repartition: collapsing
  partitions needs no exchange).
- **versioned snapshots** — overwrite-in-place destroys the previous
  state mid-write (readers see partial data) and forever (no
  rollback). `write_snapshot` writes `v=N` directories plus a tiny
  `_LATEST` pointer committed LAST, giving atomic publish, time travel
  (`read_snapshot(version=...)`) and O(1) rollback (`rollback`) — the
  poor-man's form of what Delta/Iceberg transaction logs provide, with
  the same reader contract (readers never observe a half-written
  version because the pointer flips only after the data lands).
- **manifest-based data skipping** — Iceberg's core read-path idea:
  each published version carries a per-file min/max/count *manifest*
  (`v=N/_manifest/`, computed at publish time), and a range scan
  consults the manifest — #files rows — to choose which data files to
  open instead of listing the directory and reading every footer. See
  `scan_pruned`. At 100 TB the manifest is the difference between a
  planner touching KBs of metadata and opening millions of files.

Why not the real `.format("delta")` / `.format("iceberg")` path: the
connector jars are not in this container's pyspark distribution and the
sandbox has no network (repo1.maven.org unresolvable — verified), so
`spark.jars.packages` cannot fetch them; `sources/writers.write_table`
keeps the format-pluggable call site for clusters that ship the jars,
and this module provides the transaction-log semantics (atomic publish,
time travel, rollback, vacuum, file-stats manifests) on plain parquet.
"""

from __future__ import annotations

import math
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree,
    honoring the reader's hidden-file convention (`_*`/`.*` children —
    _SUCCESS, _manifest — are metadata, not data)."""
    n, total = 0, 0
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite ``path`` to ceil(total/target) files. Returns
    (files_before, files_after).

    `coalesce` merges scan partitions without a shuffle; the rewrite
    streams each output file from its input files directly. The write
    lands in a sibling temp dir then atomically renames over the
    original, so concurrent readers see old-or-new, never partial.
    """
    before, total_bytes = dir_stats(path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    tmp = path.rstrip("/") + "__compacting"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    after, _ = dir_stats(path)
    return before, after


def _version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v={version}")


def _pointer(root: str) -> str:
    return os.path.join(root, "_LATEST")


def latest_version(root: str) -> int | None:
    try:
        with open(_pointer(root)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _manifest_dir(root: str, version: int) -> str:
    # Underscore prefix: parquet directory scans ignore `_*` children
    # (same convention as _SUCCESS/_metadata), so the manifest can live
    # inside its version dir — colocated, vacuumed with it — without
    # polluting `read_snapshot`'s data scan.
    return os.path.join(_version_dir(root, version), "_manifest")


def write_snapshot(
    df: DataFrame, root: str, stat_cols: "Sequence[str] | None" = None
) -> int:
    """Write the next version directory, then flip the `_LATEST` pointer
    (data first, pointer last = atomic publish). Returns the version.

    The new version is allocated ABOVE every retained version, not
    pointer+1 — publishing after a rollback must branch forward (v3
    published, v4..v6 retained → next is v7), never silently overwrite
    a retained directory.

    ``stat_cols`` opts the version into Iceberg-style manifests: after
    the data lands (and before the pointer flips — a published version
    always has its manifest), a per-file min/max/count table over those
    columns is written to ``v=N/_manifest/``. `scan_pruned` then plans
    range scans from the manifest instead of the directory listing.
    Publish-time stats cost one extra read of the just-written version —
    the same trade Iceberg/Delta make by collecting stats in the writer.
    """
    from march_mania_spark_lakehouse_spark.operators.sketch import (
        file_stats_manifest,
    )

    cur = latest_version(root)
    existing = retained_versions(root)
    floor = max([cur if cur is not None else -1, *existing], default=-1)
    nxt = floor + 1
    df.write.mode("overwrite").parquet(_version_dir(root, nxt))
    if stat_cols:
        spark = df.sparkSession
        data = spark.read.parquet(_version_dir(root, nxt))
        file_stats_manifest(data, stat_cols).coalesce(1).write.mode(
            "overwrite"
        ).parquet(_manifest_dir(root, nxt))
    os.makedirs(root, exist_ok=True)
    tmp = _pointer(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, _pointer(root))  # atomic on POSIX
    return nxt


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read `_LATEST` (default) or any retained version (time travel)."""
    v = latest_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshot published under {root}")
    return spark.read.parquet(_version_dir(root, v))


def read_manifest(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The file-stats manifest of `_LATEST` (default) or any retained
    version: (file, n_rows, min_<c>, max_<c>…), one row per data file."""
    v = latest_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshot published under {root}")
    mdir = _manifest_dir(root, v)
    if not os.path.isdir(mdir):
        raise FileNotFoundError(
            f"version {v} under {root} was published without stat_cols "
            "(no manifest) — pass stat_cols to write_snapshot"
        )
    return spark.read.parquet(mdir)


def scan_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Manifest-driven range scan: read ONLY the data files whose
    [min, max] for ``col`` overlaps [lo, hi], then apply the residual
    row filter.

    This is Iceberg's read path on the homegrown snapshot layer: the
    planner's input is the manifest (#files rows, collected driver-side
    — exactly the metadata a query planner holds), never a directory
    listing, and non-overlapping files are not opened at all — no
    footer read, no task. Sound because `prune_files` keeps every file
    that *could* contain a match; the residual filter restores exact
    row semantics inside kept files. Equal to a full-scan+filter by
    construction (pinned by the parity test in test_maintenance.py).
    """
    from march_mania_spark_lakehouse_spark.operators.sketch import prune_files

    v = latest_version(root) if version is None else version
    keep = [
        r["file"]
        for r in prune_files(read_manifest(spark, root, v), col, lo, hi).collect()
    ]
    vdir = _version_dir(root, v)
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if not keep:
        # schema-only scan of the version dir; no file contains a match
        return spark.read.parquet(vdir).filter(F.lit(False))
    return spark.read.parquet(
        *[os.path.join(vdir, f) for f in sorted(keep)]
    ).filter(pred)


def rollback(root: str, version: int) -> None:
    """O(1) rollback: point `_LATEST` at an older retained version."""
    if not os.path.isdir(_version_dir(root, version)):
        raise FileNotFoundError(f"version {version} not retained under {root}")
    tmp = _pointer(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _pointer(root))


def retained_versions(root: str) -> list[int]:
    """All version numbers physically present under ``root``, ascending."""
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return []
    out = []
    for name in names:
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def vacuum(root: str, keep_last: int = 2) -> list[int]:
    """Drop snapshot versions older than the newest ``keep_last``,
    NEVER dropping the published (`_LATEST`) version even if it is old
    (post-rollback safety: a pointer at v3 with v8/v9 retained must not
    lose v3). Returns the versions removed.

    Retention is the other half of versioned snapshots: without it a
    100 TB table republished daily doubles its footprint every
    ``keep_last`` days. Deletion order is oldest-first and the pointer
    is never touched, so a reader that resolved `_LATEST` before the
    vacuum still reads a fully retained version.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = retained_versions(root)
    keep = set(versions[-keep_last:])
    cur = latest_version(root)
    if cur is not None:
        keep.add(cur)
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(_version_dir(root, v))
            removed.append(v)
    return removed


def analyze_table(
    spark: SparkSession,
    table: str,
    columns: "Sequence[str] | None" = None,
) -> dict:
    """ANALYZE a managed table and return the recorded statistics.

    Runs ``ANALYZE TABLE ... COMPUTE STATISTICS`` (table-level sizeInBytes
    + rowCount) and, when ``columns`` is given, ``FOR COLUMNS ...``
    (per-column ndv/nulls/min/max histograms) — the inputs the cost-based
    optimizer (``spark.sql.cbo.enabled``) needs for join reordering and
    build-side selection. At 100 TB this is what lets the planner
    broadcast a filtered dimension whose *file* size looks huge but whose
    *post-filter* cardinality is tiny, without AQE having to discover it
    at runtime.

    Returns ``{"rowCount": int|None, "sizeInBytes": int|None,
    "columns": {col: {stat: value}}}`` parsed from the catalog.
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(columns)
        )
    detail = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    stats = detail.get("Statistics", "") or ""
    out: dict = {"rowCount": None, "sizeInBytes": None, "columns": {}}
    for part in stats.split(","):
        part = part.strip()
        if part.endswith("bytes"):
            out["sizeInBytes"] = int(part.split()[0])
        elif part.endswith("rows"):
            out["rowCount"] = int(part.split()[0])
    for col in columns or ():
        rows = spark.sql(f"DESCRIBE EXTENDED {table} {col}").collect()
        out["columns"][col] = {r["info_name"]: r["info_value"] for r in rows}
    return out
