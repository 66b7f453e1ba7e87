"""Capture timings + formatted plans for selected queries (guide §1).

Usage:
  python tools/plan_probe.py q224 q225 ...       # timings + plans
  python tools/plan_probe.py --plans-to plans/r13 --suffix before q224 ...
  python tools/plan_probe.py --all               # every bench query, timings only

Prints per-query: warmup (first call), best of N steady-state noop-sink
runs, and optionally writes `.explain("formatted")` to
<plans-to>/<qname>_<suffix>.txt.  Jobs are labelled for the UI/eventlog.
"""

from __future__ import annotations

import argparse
import os
import time

from march_mania_spark_lakehouse_spark.plans import all_queries
from march_mania_spark_lakehouse_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="short names (q224) or full")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans-to", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    specs = {n: s for n, s in sorted(all_queries().items()) if s.bench}
    short = {n.split("_", 1)[0]: n for n in specs}
    if args.all:
        names = list(specs)
    else:
        names = [short.get(q, q) for q in args.queries]

    spark = get_spark("plan_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if args.plans_to:
        os.makedirs(args.plans_to, exist_ok=True)

    print(f"{'query':48s} {'warmup':>8s} {'build':>7s} {'best':>8s}  samples")
    total = 0.0
    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"{name} warmup")
        t0 = time.perf_counter()
        df = spec.fn(spark, args.sf_dir)
        _force(df)
        warm = time.perf_counter() - t0
        samples = []
        builds = []
        for i in range(args.samples):
            spark.sparkContext.setJobDescription(f"{name} steady {i}")
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            builds.append(time.perf_counter() - t0)
            _force(df)
            samples.append(time.perf_counter() - t0)
        best = min(samples)
        total += best
        print(f"{name:48s} {warm:8.2f} {min(builds):7.2f} {best:8.2f}  "
              + " ".join(f"{s:.2f}" for s in samples))
        if args.plans_to:
            qshort = name.split("_", 1)[0]
            path = os.path.join(args.plans_to, f"{qshort}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(spec.fn(spark, args.sf_dir)
                         ._jdf.queryExecution().explainString(
                             spark._jvm.org.apache.spark.sql.execution
                             .ExplainMode.fromString("formatted")))
    print(f"total best: {total:.2f}s over {len(names)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
