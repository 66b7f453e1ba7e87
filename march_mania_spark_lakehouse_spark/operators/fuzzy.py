"""Blocked fuzzy string matching (entity resolution without a cartesian).

Edit-distance joins are the classic scale trap: a naive
`a CROSS JOIN b WHERE levenshtein(name_a, name_b) <= d` is O(|a|·|b|)
and unrunnable at 100 TB. The standard fix — same shape as the LSH
dedup path (`operators/dedup.py`) — is *blocking*: derive a cheap
deterministic key that any two matchable strings must share, equi-join
on it (hash join, shuffle on the block key), and run the expensive
distance only on within-block candidate pairs.

`levenshtein` is a JVM built-in (`pyspark.sql.functions.levenshtein`,
unit-cost insert/delete/substitute — identical semantics to DuckDB's
`levenshtein`), so the verify stage stays inside whole-stage codegen;
no Python touches the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.operators.core import rebalance_scan


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int = 1,
) -> DataFrame:
    """All intra-block pairs `(id_a < id_b)` with edit distance ≤
    `max_dist`. `block` must be a *blocking key* expression over the
    input columns: complete w.r.t. the chosen radius (two strings within
    `max_dist` must share it) — e.g. a prefix that the allowed edits
    cannot touch, a soundex code, or a length bucket union.

    Scale shape: one shuffle on the block key; pair enumeration and the
    levenshtein verify are partition-local. Skewed (huge) blocks are the
    residual risk — mitigate upstream by refining the key, exactly like
    salting a skewed join (`operators/skew.py`).
    """
    # The verify stage runs WHERE the probe side is partitioned: when the
    # block join broadcasts (the common shape — the blocked table is the
    # small side), a single-file input scans as ONE task and every
    # levenshtein runs serially while the other cores idle
    # (optimization round 13, guide §2.6/§2.5-input-skew).
    # `rebalance_scan` is an identity whenever the scan already has ≥
    # default-parallelism partitions, i.e. always at real scale.
    a = rebalance_scan(df).select(
        block.alias("block"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    b = df.select(
        block.alias("block"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        # length gap > d can never be within distance d — an O(1)
        # codegen prefilter before the O(len·d) verify
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= F.lit(max_dist)
        )
        # thresholded levenshtein short-circuits to -1 past max_dist:
        # O(len·d) per pair instead of O(len²)
        .filter(F.levenshtein("name_a", "name_b", max_dist) >= 0)
        .select("id_a", "id_b", "name_a", "name_b")
    )
