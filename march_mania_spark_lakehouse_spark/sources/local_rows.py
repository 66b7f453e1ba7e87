"""Driver-built metadata DataFrames with input-sized partitioning.

``spark.createDataFrame(local_list, schema)`` parallelizes the list into
``defaultParallelism`` slices regardless of its size, so every KB-sized
metadata map the lake layer builds (file→DV descriptors, partition-value
maps, manifest paths, snapshot rows …) costs one near-empty Python task
per core PER ACTION — measured at ~0.5 s per action on local[32] vs
~0.22 s with input-sized slices (optimization round 13, guide §2.6:
tasks are not free; §6: small inputs want few partitions). These maps
are broadcast or collected downstream, so wide slicing buys nothing at
any scale — a 100 TB table's manifest LIST is still driver-metadata-
sized, and genuinely large row sets scale up by the rows-per-slice rule
below (capped only when the caller asks for explicit fan-out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: target rows per slice for driver-side metadata lists — sized so the
#: pickled partition stays well under a shuffle block while slice count
#: stays O(rows/512), not O(cores)
_ROWS_PER_SLICE = 512


def local_df(
    spark: SparkSession,
    rows,
    schema: str,
    slices: int | None = None,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with input-sized slicing.

    ``slices=None`` (default) picks ``ceil(len(rows)/512)`` capped at
    ``defaultParallelism`` — 1 task for the common KB-sized map, the
    same cap as before for genuinely large lists. Pass ``slices``
    explicitly when downstream per-task work wants a specific fan-out
    (e.g. one manifest or one DV decode per task); that replaces the
    ``createDataFrame(...).repartition(n)`` idiom WITHOUT the extra
    Exchange. Note ParallelCollectionRDD slices the list into
    CONTIGUOUS equal-count blocks (not round-robin interleaving), so
    per-slice fan-out balances by row COUNT only — fine for the
    one-unit-of-work-per-row callers here; do not rely on it to break
    up skew the way ``repartition(n)`` would.

    Error-timing note: plain ``createDataFrame(list)`` verifies rows
    against the schema eagerly on the driver; the parallelize path
    surfaces a malformed row as a task failure at the FIRST ACTION
    instead. These lists are engine-built (never user input), so the
    trade is acceptable — but attribute such a failure to the build
    site, not the action site.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    if slices is None:
        slices = (len(rows) + _ROWS_PER_SLICE - 1) // _ROWS_PER_SLICE
        slices = min(slices, spark.sparkContext.defaultParallelism)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, min(slices, len(rows)))),
        schema,
    )
