"""Sinks (S4, S5, S9, S10): parquet layer writes, single-file CSV export,
driver-side JSON/CSV artifacts.

Reference parity: overwrite-parquet at every layer (`jobs/01:65` etc.),
the coalesce(1)-then-rename single-file CSV export for submissions
(`jobs/04_train_and_export_submission.py:49-56`), and driver-side
csv/json artifact round-trips (`jobs/07:101-104`, `jobs/11:56-58`).

Scale: ``write_parquet`` takes partition columns so big tables land
partition-pruned (e.g. by date); single-file CSV stays a deliberate
small-export-only tool (it serializes through one task by design).
"""

from __future__ import annotations

import csv
import glob
import json
import os
import shutil
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    The 100 TB co-location tool: two tables bucketed by the same join key
    into the same bucket count join with ZERO exchange — each task reads
    matching bucket files from both sides. Worth it for fact⋈fact joins
    reused across many queries, where a broadcast is impossible and
    re-shuffling per query would dominate. Sorted buckets additionally
    let sort-merge join skip its sort.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> str:
    """Format-pluggable lake write: 'delta' / 'iceberg' when the runtime
    ships the connector, falling back to parquet otherwise (this
    container has neither — the call site stays identical on a cluster
    that does). Returns the format actually used."""
    if fmt in ("delta", "iceberg"):
        try:
            writer = df.write.format(fmt).mode(mode)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.save(path)
            return fmt
        except Exception as e:
            # Fall back ONLY when the connector is missing — any other
            # failure (schema conflict, concurrent write, storage error)
            # must surface, not silently degrade the table to parquet.
            msg = str(e)
            if not (
                "Failed to find data source" in msg
                or "Failed to find the data source" in msg
                or "ClassNotFoundException" in msg
                or "DATA_SOURCE_NOT_FOUND" in msg
            ):
                raise
            fmt = "parquet"
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return "parquet"


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """JSON-lines sink — the interchange format for downstream tools
    that don't speak parquet (one object per line, splittable when
    uncompressed or zstd-framed)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink — columnar alternative with the same partitioned-layout
    options as parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_single_csv(df: DataFrame, dest_file: str, header: bool = True) -> None:
    """coalesce(1) → temp dir → move the one part file to ``dest_file``."""
    tmp = dest_file + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(tmp)
    parts = glob.glob(os.path.join(tmp, "part-*.csv"))
    if len(parts) != 1:
        raise RuntimeError(f"expected exactly one part file in {tmp}, got {parts}")
    os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
    shutil.move(parts[0], dest_file)
    shutil.rmtree(tmp)


def write_driver_csv(rows: Sequence[Sequence[Any]], header: Sequence[str], dest_file: str) -> None:
    """Driver-side metrics CSV (S9) — artifacts, not data."""
    os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
    with open(dest_file, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def write_driver_json(obj: Any, dest_file: str) -> None:
    os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
    with open(dest_file, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)


def read_driver_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)
