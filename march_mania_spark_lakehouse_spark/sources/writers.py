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
