"""Ordered per-group sequential folds — the one operator Catalyst cannot
express relationally (SURVEY.md §2.10 UD1).

Reference parity: `src/features/elo.py:58-121` runs a sequential Elo
update per season via ``groupBy("Season").applyInPandas``. We keep the
same physical shape (grouped-map pandas UDF, declared output schema,
total in-group ordering) but:

- use the plain (non-iterator) ``applyInPandas`` signature, so a group is
  always a single DataFrame — this avoids the reference's latent
  chunk-state bug (`elo.py:98-113` keeps per-chunk, not cross-chunk,
  rating state);
- require an explicit *total* ordering (caller passes tiebreaker
  columns), where the reference relies on stable mergesort + input order
  (`elo.py:104`).

Scale: one shuffle on the group key; each group must fit in one python
worker's memory (seasons / user-histories do). Arrow batches the
exchange. Groups fold independently → embarrassingly parallel across
executors.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def ordered_fold(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    fold_fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
) -> DataFrame:
    """Sort each group by ``order_cols`` (a total order) and apply ``fold_fn``.

    ``fold_fn`` receives the sorted group as one pandas DataFrame and
    returns the folded result (any number of rows) matching
    ``output_schema``.
    """
    group_cols = list(group_cols)
    order_cols = list(order_cols)

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return fold_fn(pdf.sort_values(order_cols, kind="mergesort"))

    return df.groupBy(*group_cols).applyInPandas(_apply, schema=output_schema)


def exp_decay_fold(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_value_col: str = "decayed_value",
) -> DataFrame:
    """Exponentially-decayed running total per group: s ← α·s + v, one
    output row per group with the final state and the row count."""

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # np.polyval evaluates the same Horner recurrence s ← α·s + v in
        # C — bit-identical to the element loop, ~100× less interpreter
        # overhead per group.
        import numpy as np

        vals = pdf[value_col].to_numpy(dtype=np.float64)
        state = float(np.polyval(vals, alpha)) if len(vals) else 0.0
        head = {c: [pdf[c].iloc[0]] for c in group_cols}
        head[out_value_col] = [state]
        head["n_rows"] = [len(pdf)]
        return pd.DataFrame(head)

    group_schema = ", ".join(
        f"{name} {dtype}"
        for name, dtype in df.select(*group_cols).dtypes  # noqa: PD011 (pyspark dtypes)
    )
    schema = f"{group_schema}, {out_value_col} double, n_rows long"
    return ordered_fold(df, group_cols, order_cols, _fold, schema)


def elo_ratings(
    matches: DataFrame,
    group_col: str = "season",
    order_cols: Sequence[str] = ("match_id",),
    a_col: str = "player_a",
    b_col: str = "player_b",
    a_won_col: str = "a_won",
    k: float = 20.0,
    base: float = 1500.0,
) -> DataFrame:
    """Sequential Elo per independent group (reference `src/features/elo.py`).

    Input: one row per match with two player ids and the binary outcome.
    Output: one row per (group, player) with the final rating.

    Expected score E_a = 1 / (1 + 10^((r_b - r_a)/400)); update
    r_a += k·(outcome − E_a), r_b symmetric — `elo.py:33-53` parity.
    """

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        ratings: dict[int, float] = {}
        for row in pdf.itertuples(index=False):
            a = int(getattr(row, a_col))
            b = int(getattr(row, b_col))
            ra = ratings.get(a, base)
            rb = ratings.get(b, base)
            ea = 1.0 / (1.0 + 10.0 ** ((rb - ra) / 400.0))
            sa = float(getattr(row, a_won_col))
            ratings[a] = ra + k * (sa - ea)
            ratings[b] = rb + k * ((1.0 - sa) - (1.0 - ea))
        group_val = pdf[group_col].iloc[0]
        players = sorted(ratings)
        return pd.DataFrame(
            {
                group_col: [group_val] * len(players),
                "player_id": players,
                "elo": [ratings[p] for p in players],
            }
        )

    group_dtype = dict(matches.dtypes)[group_col]
    schema = f"{group_col} {group_dtype}, player_id long, elo double"
    return ordered_fold(matches, [group_col], list(order_cols), _fold, schema)
