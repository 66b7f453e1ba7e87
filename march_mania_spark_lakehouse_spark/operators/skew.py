"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join split handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in our session factory), but
two shapes still need explicit salting at 100 TB:

- a *hot grouping key* (one key ≫ everything else): one reducer gets the
  whole key. ``salted_agg`` splits it across ``n_salts`` reducers with a
  two-stage combine — valid for any algebraic aggregate (sum/count/min/
  max; avg as sum÷count).
- a *hot join key* against a non-broadcastable right side:
  ``salted_join`` spreads the hot left rows over ``n_salts`` partitions
  and replicates only the matching right rows ``n_salts``× (replication
  cost = |right| × n_salts, chosen by the caller).

Both transforms are pure DataFrame ops — Catalyst still plans the
physical exchange; salting only reshapes the key space.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Uniform salt in [0, n_salts). ``rand(seed)`` is deterministic per
    (partition, row-offset), so the assignment can shift when the scan
    layout changes — which is safe here: every downstream salted op is
    salt-invariant (any assignment yields identical results; only the
    reducer spread varies)."""
    return df.withColumn(SALT_COL, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage aggregation over a skewed key.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Stage 1 combines per (keys, salt) — spreading
    a hot key over ``n_salts`` reducers — stage 2 merges the ≤ n_salts
    partial rows per key (sum of partial sums/counts, min of mins, …).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial_cols: list[Column] = []
    final_cols: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn not in mergers:
            raise ValueError(f"non-algebraic aggregate: {fn}")
        stage1 = F.count(col) if fn == "count" else getattr(F, fn)(col)
        partial_cols.append(stage1.alias(out))
        final_cols.append(mergers[fn](out).alias(out))
    return (
        with_salt(df, n_salts)
        .groupBy(*keys, SALT_COL)
        .agg(*partial_cols)
        .groupBy(*keys)
        .agg(*final_cols)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the left (skewed/fact) side salted.

    Left rows get one salt each; right rows are exploded to all
    ``n_salts`` values, so every (key, salt) pair finds its match and the
    hot key's rows land on ``n_salts`` different reducers.

    Only left-preserving joins are valid: an unmatched RIGHT row would
    survive once per salt copy under right/full outer semantics.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "semi",
                   "left_semi", "leftsemi", "anti", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r} "
            "(an unmatched right row would appear n_salts times)"
        )
    salted_left = with_salt(left, n_salts)
    exploded_right = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(
        exploded_right, [*on, SALT_COL], how
    ).drop(SALT_COL)


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    val: str,
    alias: str = "n_distinct",
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT val) that survives a hot key.

    Plain algebraic aggregates (sum/count/min/max) do NOT need salting in
    Spark — map-side partial aggregation collapses a hot key to one
    partial row per task before the shuffle (measured in
    tools/skew_probe.py). Distinct-count is the aggregate that genuinely
    skews: partials must keep every distinct value, so a key holding
    100M distinct values ships them all to a single reducer.

    Fix: salt by ``hash(val) % n_salts`` — the salt is derived from the
    *counted value*, so the distinct-value sets of different salts are
    disjoint by construction and the exact count is the SUM of per-salt
    distinct counts. (A random salt would double-count values that land
    in multiple salts; a value-derived salt cannot.) The hot key's
    distinct set spreads over ``n_salts`` reducers; result is exact, not
    approximate — use HLL (`operators/sketch.py`) when ±2% is fine.
    """
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(val)), F.lit(n_salts))
    )
    return (
        salted.groupBy(*keys, SALT_COL)
        .agg(F.count_distinct(F.col(val)).alias("__pc"))
        .groupBy(*keys)
        .agg(F.sum("__pc").alias(alias))
    )
