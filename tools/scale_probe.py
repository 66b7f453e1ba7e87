"""Scaling probe: time representative queries at sf0.1 and at a 10×
replica (sf1-equivalent) to measure how each plan family actually
scales — the empirical check behind PERF.md's "would this survive a
scale-up" claims.

The 10× dataset is derived from the driver's sf0.1 fixture by unioning
K offset copies (keys shifted per copy so FK joins stay consistent and
cardinalities really grow; region/nation stay single-copy dims). Data
lands under .scale_test/ (gitignored) and is generated once.

Usage: python tools/scale_probe.py [--regen]
Prints one JSON line: {query: {"t_small": s, "t_big": s, "ratio": r}}.
A ratio ≤ K means the plan scales at-worst linearly (fixed overhead
amortizes); a super-linear ratio flags a plan that would not survive a
real scale-up.
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
from march_mania_spark_lakehouse_spark.plans import all_queries  # noqa: E402
from march_mania_spark_lakehouse_spark.session import get_spark  # noqa: E402

K = int(os.environ.get("SPARK_GRAFT_SCALE_K", "10"))
SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale_test", f"x{K}")

#: key columns to offset per copy (table -> cols); dims region/nation
#: are copied once — they stay dimension-sized at any scale.
OFFSET_COLS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
SINGLE_COPY = ("region", "nation")

#: large, collision-free stride (all fixture keys are far below this)
STRIDE = 10_000_000

PROBES = tuple(
    os.environ.get(
        "SPARK_GRAFT_SCALE_PROBES",
        ",".join(
            (
                "q01_pricing_summary",      # full-scan agg
                "q02_star_join_revenue",    # star join (broadcast dims)
                "q11_topk_orders_per_customer",  # window top-k
                "q20_exact_dedup",          # hash dedup
                "q43_sessionize",           # event-time windows
                "q25_cosine_topk",          # similarity brute force
                "q87_decontamination",      # broadcast shingle semi-join
                "q54_salted_agg",           # skew-mitigated agg
                "q105_cohort_retention",    # behavioral double-shuffle
                "q119_bigram_logprob",      # corpus LM scoring
                "q81_merge_upsert",         # MERGE write-path relational core
                "q82_scd2_history",         # SCD2 dimension history
                "q116_incremental_refresh", # IVM delta-merge refresh
                "q63_session_window_native",  # native session_window
                "q129_manifest_pruned_scan",  # manifest-planned range scan
                "q131_delta_time_travel",     # Delta-log replay + two snapshot scans
                "q177_iceberg_time_travel",   # Iceberg metadata plan + two snapshot scans
                "q178_iceberg_pruned_scan",   # manifest-bounds data skipping
                "q174_jpeg_roundtrip",        # per-doc Python codec (Arrow batches)
                "q179_mp4_metadata",          # per-doc container parsing
                "q160_tpch_q21_sole_late_supplier",  # semi/anti self-joins on pair tables
                "q161_segment_dedup",         # segment explode + hot-set broadcast + reassemble
                "q162_semantic_dedup",        # within-cell pair join, Σ cell²
                "q164_pagerank_trade_graph",  # iterative fixed-point power steps
                "q166_bfs_trade_reach",       # frontier relaxation, node-bounded levels
            )
        ),
    ).split(",")
)


def generate(spark) -> None:
    # Load through catalog.load, not vanilla spark.read.parquet: the
    # catalog normalizes the events `ts` physical unit (ns-vintage
    # fixtures would otherwise crash or load 1000x-skewed here).
    # Write timestamps as INT64 micros — Spark's INT96 default would
    # make the replica unreadable by the catalog's unit sniffer.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    os.makedirs(BIG, exist_ok=True)
    for t in SINGLE_COPY:
        catalog.load(spark, t, SMALL).write.mode(
            "overwrite"
        ).parquet(f"{BIG}/{t}.parquet")
    for t, keys in OFFSET_COLS.items():
        df = catalog.load(spark, t, SMALL)
        copies = None
        for i in range(K):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            copies = c if copies is None else copies.unionByName(c)
        copies.write.mode("overwrite").parquet(f"{BIG}/{t}.parquet")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    if "--regen" in sys.argv and os.path.isdir(BIG):
        shutil.rmtree(BIG)
    spark = get_spark("scale_probe")
    if not os.path.isdir(os.path.join(BIG, "lineitem.parquet")):
        generate(spark)

    specs = all_queries()
    out = {}
    for name in PROBES:
        fn = specs[name].fn
        times = {}
        for label, sf_dir in (("t_small", SMALL), ("t_big", BIG)):
            force(fn(spark, sf_dir))  # warm codegen/JIT for this shape
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            times[label] = round(best, 3)
        times["ratio"] = round(times["t_big"] / max(times["t_small"], 1e-9), 2)
        out[name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps({"k": K, "probes": out}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
