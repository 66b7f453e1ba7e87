"""Streaming-dedup index-probe scale probe: show the per-micro-batch
probe cost tracks the BATCH, not the corpus, now that the persisted
band index is partitioned by (band, pb = bh % index_buckets) and each
batch scans only its touched partitions (round 8 — previously every
micro-batch re-read the whole index table).

Protocol: build the band index of the sf0.1 documents fixture at 1×
and at K× (synthetic id/hash offsets — K× more index rows across the
same partition grid), then time `process_dedup_batch` for the SAME
small fixed batch against each. Recorded:

- probe_sec per scale (wall time of the whole batch body: touched-key
  collect, pruned scan, dedup joins, two Delta commits),
- files_scanned: how many index files the pruned probe actually
  planned vs the table's total (the pruning under test),
- time_ratio K×/1×: ~1 (flat) is the claim; the old full-scan loop
  grows with the index.

Usage: python tools/index_probe.py [--k K] [--buckets B]
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

from march_mania_spark_lakehouse_spark import catalog  # noqa: E402
from march_mania_spark_lakehouse_spark.operators import dedup  # noqa: E402
from march_mania_spark_lakehouse_spark.session import get_spark  # noqa: E402
from march_mania_spark_lakehouse_spark.sources import delta_log  # noqa: E402
from march_mania_spark_lakehouse_spark.streaming.dedup import (  # noqa: E402
    process_dedup_batch,
)

SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_test", "index_probe",
)
STRIDE = 10_000_000


def _publish_index(spark, k: int, path: str, buckets: int) -> None:
    """Index table of the documents fixture at k×: real band rows,
    replicated with offset ids and perturbed hashes so every copy
    lands as extra DISTINCT index entries across the partition grid.
    Written as several appends — the multi-file-per-partition layout a
    long-running loop accretes."""
    docs = catalog.load(spark, "documents", SMALL).select("doc_id", "text")
    base = dedup.minhash_band_index(docs, "doc_id", "text").localCheckpoint()
    appends = min(k, 8)  # k× rows via `appends` commits of ~k/appends copies
    per = -(-k // appends)  # ceil: the last append takes the remainder
    done = 0
    for a in range(appends):
        n = min(per, k - done)
        if n <= 0:
            break
        copies = None
        for i in range(n):
            j = done + i
            c = base.select(
                (F.col("doc_id") + F.lit(j * STRIDE)).alias("doc_id"),
                "band",
                # keep copy 0 verbatim; perturb the rest so the index
                # really holds k× distinct (band, bh) entries
                (
                    (F.col("bh") + F.lit(j * 1_000_003)) % F.lit(dedup.PORTABLE_MOD)
                ).alias("bh"),
            )
            copies = c if copies is None else copies.unionByName(c)
        copies = copies.withColumn(
            "pb", F.pmod("bh", F.lit(buckets))
        ).repartition("band", "pb")
        if done == 0:
            delta_log.create(
                copies, path, stat_cols=["bh"], partition_by=["band", "pb"],
                configuration={"streamingDedup.indexBuckets": str(buckets)},
            )
        else:
            delta_log.append(copies, path, stat_cols=["bh"])
        done += n


def main() -> None:
    k = 100
    buckets = 32
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    if "--buckets" in sys.argv:
        buckets = int(sys.argv[sys.argv.index("--buckets") + 1])
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    spark = get_spark("index_probe")
    spark.sparkContext.setLogLevel("ERROR")
    batch = spark.createDataFrame(
        [
            (900_000_000 + i,
             " ".join(f"probeword{i}_{j}" for j in range(20)))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    out: dict = {"k": k, "buckets": buckets}
    for label, kk in (("1x", 1), (f"{k}x", k)):
        idx = os.path.join(ROOT, f"idx_{label}")
        corp = os.path.join(ROOT, f"corp_{label}")
        _publish_index(spark, kk, idx, buckets)
        total_files = len(delta_log.snapshot_files(idx))
        index_rows = delta_log.read_delta(spark, idx).count()
        # measure the pruned probe's planned file count the same way
        # the batch body does
        new_idx = dedup.minhash_band_index(
            batch, "doc_id", "text"
        ).localCheckpoint()
        touched = (
            new_idx.select("band", F.pmod("bh", F.lit(buckets)).alias("pb"))
            .distinct()
            .collect()
        )
        probe_df = delta_log.scan_partitions_any(
            spark, idx, [{"band": r["band"], "pb": r["pb"]} for r in touched]
        )
        files_scanned = len(probe_df.inputFiles())
        t0 = time.perf_counter()
        n = process_dedup_batch(
            spark, batch, 0, corp, idx, index_buckets=buckets
        )
        dt = time.perf_counter() - t0
        out[label] = {
            "probe_sec": round(dt, 3),
            "survivors": n,
            "index_rows": index_rows,
            "files_scanned": files_scanned,
            "files_total": total_files,
        }
    out["time_ratio"] = round(
        out[f"{k}x"]["probe_sec"] / max(out["1x"]["probe_sec"], 1e-9), 2
    )
    out["rows_ratio"] = round(
        out[f"{k}x"]["index_rows"] / max(out["1x"]["index_rows"], 1), 2
    )
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
