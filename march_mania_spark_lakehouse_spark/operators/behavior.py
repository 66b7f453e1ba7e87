"""Behavioral / event-sequence analytics operators.

The reference models time relationally (Season/DayNum ordering,
`SURVEY.md §1.1`) and derives per-entity histories with windows and
grouped aggregation; these operators generalize that shape to the event
streams a production lakehouse actually serves: cohort retention,
ordered conversion funnels, event-transition matrices, and interval
concurrency. All four are pure built-in DataFrame plans — no Python in
the hot path — and every shuffle is on the entity key (`user_id`) or a
coarse time bucket, so the plans survive a 100 TB events table:

- retention/funnel shuffle once per stage on `user_id` (partial
  aggregation first, so the shuffle carries one row per user, not one
  per event);
- transitions use a `(user_id)` window — partition-parallel, bounded by
  one user's history;
- concurrency partitions its sweep-line by calendar day, so no global
  ordered window exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Classic retention triangle: bucket every user by first-activity
    period (cohort), then count distinct users active at each period
    offset.

    Two shuffles at scale: (1) min-ts per user (map-side combine → one
    row per user crosses the wire), (2) the (cohort, offset) cell
    aggregate over the distinct user-period pairs. The user⋈cohort join
    is key-aligned with shuffle (1), so AQE reuses the partitioning.
    """
    per_day = 7 if grain == "week" else 1
    first = events.groupBy(user_col).agg(
        F.date_trunc(grain, F.min(ts_col)).alias("cohort_period")
    )
    activity = events.select(
        user_col, F.date_trunc(grain, F.col(ts_col)).alias("period")
    ).distinct()
    offset = F.floor(
        F.datediff(F.col("period"), F.col("cohort_period")) / per_day
    ).cast("int")
    return (
        activity.join(first, user_col)
        .groupBy("cohort_period", offset.alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage *i* iff they have
    a stage-*i* event strictly after their (earliest qualifying)
    stage-*i−1* event. Returns one row per stage with the reached-user
    count, as ONE lazy plan (a union of scalar aggregates — no
    driver-side counting loop).

    Each stage is one filtered scan + one per-user min — the join chain
    stays on the `user_id` key, and every intermediate is user-sized,
    never event-sized. A 100 TB run does len(stages) co-partitioned
    shuffles and nothing else.
    """
    reached = events.filter(F.col(type_col) == stages[0]).groupBy(user_col).agg(
        F.min(ts_col).alias("stage_ts")
    )
    out = reached.select(
        F.lit(0).alias("stage_idx"),
        F.lit(stages[0]).alias("stage"),
        F.count(F.lit(1)).alias("n_users"),
    )
    prev = reached
    for i, stage in enumerate(stages[1:], start=1):
        prev = (
            events.filter(F.col(type_col) == stage)
            .join(prev, user_col)
            .filter(F.col(ts_col) > F.col("stage_ts"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("stage_ts"))
        )
        out = out.unionByName(
            prev.select(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    return out


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order (Markov) event-transition matrix: for each user's
    time-ordered history, count `(event_type → next event_type)` bigrams
    and the per-source transition probability.

    The `lead` window partitions by user — parallel, state bounded by
    one user's history. The probability denominator is a tiny
    per-source-type window over the already-aggregated matrix (≤
    |types|² rows), not a second scan. Deterministic ordering via the
    `(ts, tiebreak)` total order.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        # long/long division of exact counts: one IEEE op, bit-identical
        # in any engine — no rounding policy needed.
        (F.col("n").cast("double") / F.sum("n").over(tot).cast("double")).alias("p"),
    )


def peak_concurrency(
    events: DataFrame,
    ts_col: str = "ts",
    duration_minutes: int = 30,
) -> DataFrame:
    """Sweep-line peak concurrency: treat each event as a session
    `[ts, ts + duration)` and compute, per calendar day, the maximum
    number of simultaneously-open sessions **among sessions started that
    day** (both sweep points inherit the start day, so every partition's
    deltas are self-contained and the running sum never goes negative).

    This is the scale-correct formulation of interval concurrency: the
    window partitions by day (parallel), the RANGE frame makes
    same-instant +1/−1 ties deterministic in any engine, and no global
    ordered window exists. 100 TB of events = #days independent
    partitions.
    """
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    starts = events.select(day, F.col(ts_col).alias("t"), F.lit(1).alias("delta"))
    ends = events.select(
        day,
        (F.col(ts_col) + F.expr(f"INTERVAL {duration_minutes} MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionByName(ends)
    w = (
        Window.partitionBy("day")
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = pts.select("day", F.sum("delta").over(w).alias("open_sessions"))
    return running.groupBy("day").agg(F.max("open_sessions").alias("peak_concurrent"))


def yoy_growth(
    fact: DataFrame,
    key_cols: list[str],
    year_col: Column,
    measure: Column,
) -> DataFrame:
    """Year-over-year deltas: aggregate a measure per (key, year), then
    `lag` one year inside the key partition. The window is key-partitioned
    (parallel) over year-count-sized data — the expensive part is the one
    aggregation shuffle, which is unavoidable and map-side combined."""
    yearly = fact.groupBy(*key_cols, year_col.alias("year")).agg(
        measure.alias("measure")
    )
    w = Window.partitionBy(*key_cols).orderBy("year")
    prev = F.lag("measure").over(w)
    return yearly.select(
        *key_cols,
        "year",
        "measure",
        prev.alias("prev_measure"),
        (F.col("measure") - prev).alias("yoy_delta"),
        ((F.col("measure") - prev) / prev).alias("yoy_ratio"),
    )
