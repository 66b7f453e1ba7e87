"""Data-quality expectation checks — the validation pass a lakehouse
pipeline runs between layers (the reference's fail-fast column asserts,
`src/features/basketball_features.py:19-23`, generalized to *data*
contracts, not just schema contracts).

Each check is declarative (a predicate counting violations); the report
is one DataFrame plan — Spark evaluates every check in a single pass
per source table (conditional aggregation), not one job per check. The
FK check is a broadcast/shuffle anti-join, counting orphans without
materializing them.

Scale: counts only cross the shuffle (one row per check); a 100 TB scan
produces a KB-sized report. Pair with ``observe()`` (see
`pipeline/runner.py`) to collect the same counters as a side effect of
a production write instead of a separate scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation_counts(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One row per named check: (check_name, n_violations, n_rows).

    ``checks`` maps name → *violation predicate* (true = bad row). All
    checks over one table evaluate in a single scan via conditional
    aggregation.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in checks.items():
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        )
    wide = df.agg(*aggs)
    rows = None
    for name in checks:
        row = wide.select(
            F.lit(name).alias("check_name"),
            F.col(name).alias("n_violations"),
            F.col("__n").cast("long").alias("n_rows"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    check_name: str,
) -> DataFrame:
    """Referential-integrity check: count child rows whose key has no
    match in parent (NULL keys are not orphans — they're a separate
    not-null check). Anti-join keyed on the FK; parent side carries only
    its key column, so it broadcasts when small."""
    orphans = (
        child.select(F.col(child_key).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .join(
            parent.select(F.col(parent_key).alias("__k")).distinct(),
            on="__k",
            how="left_anti",
        )
    )
    n_child = child.select(F.count(F.lit(1)).alias("n"))
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).crossJoin(
        n_child
    ).select(
        F.lit(check_name).alias("check_name"),
        "n_violations",
        F.col("n").cast("long").alias("n_rows"),
    )


def dq_report(*parts: DataFrame) -> DataFrame:
    """Union per-table check outputs into one report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
