"""Set operators: by-name unions and the long-table explosion idiom.

Reference parity: `src/features/rolling.py:20-55` (U1) explodes each game
row into two per-participant rows via two projections + ``unionByName``;
`jobs/03_build_gold_training_set.py:45-60` (U3) builds label-symmetric
matchups the same way. Generalized here as ``explode_roles``.

Scale: union is a zero-shuffle operator (partition concatenation); the
downstream groupBy carries the one shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def union_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """N-ary unionByName (by-name, not positional — U1–U3)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def explode_roles(df: DataFrame, projections: Sequence[Sequence[Column]]) -> DataFrame:
    """One row per (input row × role): apply each projection, union by name.

    The reference's winners⊎losers long-table trick
    (`src/features/rolling.py:32-55`): each projection renames one "side"
    of the row into a shared schema.
    """
    return union_by_name([df.select(*proj) for proj in projections])
