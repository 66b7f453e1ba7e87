"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are expressed as compositions of existing DataFrame ops (SURVEY §2
"custom operators" rule (a)) — no UDFs, no driver loops — so Catalyst
plans them like any relational query and they scale with ordinary
shuffle/window machinery.

- ``asof_join``: one shuffle on the key, one ordered window pass. The
  classic union trick: interleave both sides on (key, ts), carry the
  last right-side value forward with ``last(..., ignorenulls=True)``,
  keep left rows. Cost is a sort within key partitions — no range
  explosion, no per-row probing.
- ``range_join``: equi-join on (key, coarse time bucket) with the right
  side exploded to every bucket its window can reach, then the exact
  range predicate filters. Turns an O(|L|·|R|) theta join into a
  bucket-local join — the standard interval-join strategy streaming
  engines use.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the matching right
    row per key — full pandas ``merge_asof`` direction surface:

    - ``backward`` (default): latest right row with right_ts < left_ts
      (strict) or <= (non-strict);
    - ``forward``: earliest right row with right_ts > / >= left_ts;
    - ``nearest``: whichever of the two is closer in time (ties go
      backward, the pandas rule), with ``strict`` excluding exact-ts
      matches from both sides.

    Output: all left columns + the as-of values (null when no matching
    right row exists) — an as-of LEFT join. One shuffle on the key;
    backward/forward are one ordered window pass, nearest is two passes
    over the same partitioning (the exchange is reused, only the sort
    repeats).

    Determinism contract: (key, right_ts) should be unique on the right —
    when two right rows tie on ts, which one wins is plan-dependent (the
    same caveat as pandas merge_asof / DuckDB ASOF). Pre-aggregate the
    right side to one row per (key, ts) if ties are possible.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    l_marked = left.withColumn(_SIDE, F.lit(0)).withColumn("__ts", F.col(left_ts))
    carried = [f"__v_{c}" for c in value_cols]
    r_marked = (
        right.select(
            *on,
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(v) for c, v in zip(value_cols, carried)],
        ).withColumn(_SIDE, F.lit(1))
    )
    both = l_marked.unionByName(r_marked, allowMissingColumns=True)

    # Carry the whole right row as one struct (plus its ts, for the
    # nearest-distance compare): the struct is non-null for every right
    # row even when its value columns are NULL, so a matched right row
    # with a NULL value yields NULL (as DuckDB ASOF / pandas merge_asof
    # do) instead of resurrecting an older non-null value.
    pack = F.when(
        F.col(_SIDE) == 1,
        F.struct(F.col("__ts").alias("__rts"), *[F.col(v) for v in carried]),
    )

    # Tie placement at equal ts decides strictness: a right row sorted
    # on the far side of the left row falls outside the window frame.
    # backward frame = (-inf, current]: strict wants tie-rights AFTER
    # left (side asc); forward frame = [current, +inf): strict wants
    # tie-rights BEFORE left (side desc). Non-strict flips each.
    def back_col() -> Column:
        side = F.col(_SIDE).asc() if strict else F.col(_SIDE).desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), side)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(pack, ignorenulls=True).over(w)

    def fwd_col() -> Column:
        side = F.col(_SIDE).desc() if strict else F.col(_SIDE).asc()
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), side)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        return F.first(pack, ignorenulls=True).over(w)

    if direction == "backward":
        attached = both.select("*", back_col().alias("__asof_pack"))
    elif direction == "forward":
        attached = both.select("*", fwd_col().alias("__asof_pack"))
    else:  # nearest: pick the closer of the two; equal distance → backward
        attached = both.select(
            "*", back_col().alias("__b"), fwd_col().alias("__f")
        )
        # Distance on the ts column's own ordered type, so nearest
        # accepts the same ts types as backward/forward (timestamp,
        # date, integer epoch, ...) instead of assuming timestamps.
        ts_type = dict(both.dtypes)["__ts"]
        if ts_type.startswith("timestamp"):
            def _dist(a: Column, b: Column) -> Column:
                return F.unix_micros(a) - F.unix_micros(b)
        elif ts_type == "date":
            def _dist(a: Column, b: Column) -> Column:
                return F.datediff(a, b)
        else:
            def _dist(a: Column, b: Column) -> Column:
                return a - b
        b_dist = _dist(F.col("__ts"), F.col("__b").getField("__rts"))
        f_dist = _dist(F.col("__f").getField("__rts"), F.col("__ts"))
        attached = attached.withColumn(
            "__asof_pack",
            F.when(
                F.col("__b").isNotNull()
                & (F.col("__f").isNull() | (b_dist <= f_dist)),
                F.col("__b"),
            ).otherwise(F.col("__f")),
        )
    out_vals = [
        F.col("__asof_pack").getField(f"__v_{c}").alias(f"asof_{c}")
        for c in value_cols
    ]
    return (
        attached.filter(F.col(_SIDE) == 0)
        .select(*left.columns, *out_vals)
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Inner join of left×right on key equality AND
    ``left_ts + lower_s <= right_ts < left_ts + upper_s`` (seconds).

    The left side is exploded to every coarse ``bucket_s``-second bucket
    its window spans, so matching is an equi-join on (key, bucket) + the
    exact filter — pick the bucket ≈ window width (the default) so each
    left row lands in ~2 buckets.
    """
    if bucket_s is None:
        bucket_s = max(upper_s - lower_s, 1)
    lo = F.col(left_ts) + F.make_dt_interval(secs=F.lit(float(lower_s)))
    hi = F.col(left_ts) + F.make_dt_interval(secs=F.lit(float(upper_s)))

    def bucket_of(ts: Column) -> Column:
        return F.floor(F.unix_timestamp(ts) / bucket_s)

    l_b = left.withColumn("__lo", lo).withColumn("__hi", hi).withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(F.col("__lo")), bucket_of(F.col("__hi")))),
    )
    r_b = right.withColumn("__bucket", bucket_of(F.col(right_ts)))
    joined = l_b.join(r_b, [*on, "__bucket"]).filter(
        (F.col(right_ts) >= F.col("__lo")) & (F.col(right_ts) < F.col("__hi"))
    )
    return joined.drop("__bucket", "__lo", "__hi")
