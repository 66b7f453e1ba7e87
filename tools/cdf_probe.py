"""CDF history-length probe: show `table_changes_cdf` is LINEAR in
commit count (round 8 — the first cut called `table_changes` once per
commit, each call replaying the whole log for DV state: O(N²); the
rewrite threads one DV-state replay through a shared per-commit
walker).

Protocol: build Delta tables with K and 4K update_where commits (each
an UPDATE pair: DV-delete + append), time `table_changes_cdf(0)`
forced end-to-end on each, and report the ratio. Linear ≈ 4; the old
quadratic walk reads ≈ 16.

Usage: python tools/cdf_probe.py [--k K]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from march_mania_spark_lakehouse_spark.session import get_spark  # noqa: E402
from march_mania_spark_lakehouse_spark.sources import delta_log  # noqa: E402

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_test", "cdf_probe",
)


def _build(spark, k: int, path: str) -> None:
    delta_log.create(
        spark.range(0, 400).select(
            F.col("id"), (F.col("id") % 10).alias("g"),
            F.col("id").cast("double").alias("val"),
        ),
        path,
    )
    for i in range(k):
        delta_log.update_where(
            spark, path, f"id % 40 = {i % 40}",
            {"val": F.col("val") + 1.0},
        )


def main() -> None:
    k = 20
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    spark = get_spark("cdf_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"k": k}
    for label, kk in (("1x", k), ("4x", 4 * k)):
        t = os.path.join(ROOT, label)
        _build(spark, kk, t)
        t0 = time.perf_counter()
        n = delta_log.table_changes_cdf(spark, t, 0).count()
        out[label] = {
            "cdf_sec": round(time.perf_counter() - t0, 3),
            "commits": 2 * kk + 1,
            "rows": n,
        }
    out["time_ratio"] = round(
        out["4x"]["cdf_sec"] / max(out["1x"]["cdf_sec"], 1e-9), 2
    )
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
