"""Pipeline runner — parity with `jobs/run_pipeline.py` / `scripts/run_pipeline.py`.

The reference launches one spark-submit subprocess per numbered job
(process isolation per step); here jobs are functions sharing one
SparkSession, which is the right local/iterative shape — on a real
cluster each entry in ``JOBS`` maps 1:1 to a spark-submit invocation, so
the orchestration story is unchanged. Fail-fast: the first job exception
aborts the run (`jobs/run_pipeline.py:46-48`).
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import SparkSession

from march_mania_spark_lakehouse_spark.pipeline.config import PipelineConfig
from march_mania_spark_lakehouse_spark.pipeline.jobs import JOBS
from march_mania_spark_lakehouse_spark.pipeline.paths import LakePaths

log = logging.getLogger(__name__)


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    paths: LakePaths,
    first: int = 1,
    last: int = max(JOBS),
) -> list[tuple[int, str, float]]:
    """Run jobs [first..last] in order; returns (number, name, seconds)."""
    timings: list[tuple[int, str, float]] = []
    for num in sorted(JOBS):
        if not first <= num <= last:
            continue
        name, fn = JOBS[num]
        t0 = time.perf_counter()
        log.info("job %02d %s: starting", num, name)
        fn(spark, cfg, paths)
        dt = time.perf_counter() - t0
        log.info("job %02d %s: done in %.1fs", num, name, dt)
        timings.append((num, name, dt))
    return timings


def main() -> None:
    import sys

    from march_mania_spark_lakehouse_spark.session import get_spark

    first = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    last = int(sys.argv[2]) if len(sys.argv) > 2 else max(JOBS)
    cfg = PipelineConfig()
    spark = get_spark("pipeline")
    for num, name, dt in run_pipeline(spark, cfg, LakePaths.from_env(), first, last):
        print(f"job {num:02d} {name}: {dt:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
