"""Golden cases for the temporal joins (as-of, range)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from march_mania_spark_lakehouse_spark.operators import temporal


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_strict_golden(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T10:00:00")),   # before any right → null
            (2, 1, _ts("2024-01-01T12:00:00")),   # equal ts, strict → 100 not 200
            (3, 1, _ts("2024-01-01T13:00:00")),   # → 200 (latest earlier)
            (4, 2, _ts("2024-01-01T13:00:00")),   # other key → null
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), 100.0),
            (1, _ts("2024-01-01T12:00:00"), 200.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = {
        r["id"]: r["asof_v"]
        for r in temporal.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["v"], strict=True,
        ).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 200.0, 4: None}


def test_asof_join_non_strict_sees_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T12:00:00"))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), 200.0)], "k long, ts timestamp, v double"
    )
    out = temporal.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        value_cols=["v"], strict=False,
    ).collect()
    assert out[0]["asof_v"] == 200.0


def test_range_join_bounds_are_half_open(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T12:00:00"))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), 1.0),  # == lower bound → in
            (1, _ts("2024-01-01T11:30:00"), 2.0),  # in
            (1, _ts("2024-01-01T12:00:00"), 3.0),  # == upper bound → out
            (1, _ts("2024-01-01T10:59:59"), 4.0),  # below → out
            (2, _ts("2024-01-01T11:30:00"), 5.0),  # other key → out
        ],
        "k long, rts timestamp, v double",
    )
    got = sorted(
        r["v"]
        for r in temporal.range_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            lower_s=-3600, upper_s=0,
        ).collect()
    )
    assert got == [1.0, 2.0]


def test_range_join_bucket_size_invariance(spark, sf_dir):
    """Result must not depend on the bucket width (coarser buckets only
    add candidates that the exact filter removes)."""
    from march_mania_spark_lakehouse_spark import catalog

    ev = catalog.load(spark, "events", sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value"
    )
    a = temporal.range_join(errors, clicks, ["user_id"], "ts", "c_ts", -3600, 0,
                            bucket_s=3600)
    b = temporal.range_join(errors, clicks, ["user_id"], "ts", "c_ts", -3600, 0,
                            bucket_s=600)
    key = lambda df: sorted((r["event_id"], r["c_ts"]) for r in df.collect())
    assert key(a) == key(b)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Independent oracle: seeded random data vs pandas.merge_asof for
    both strict and non-strict semantics."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")
    left_pd = pd.DataFrame(
        {
            "id": np.arange(400),
            "k": rng.integers(0, 8, 400),
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, 400), unit="s"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 8, 300),
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, 300), unit="s"),
            "v": rng.normal(size=300).round(6),
        }
    )
    # merge_asof needs unique (k, ts) on the right for a deterministic
    # answer — dedupe keeping the max v (matches our last-in-order pick
    # only when unique, so just drop dups entirely).
    right_pd = right_pd.drop_duplicates(subset=["k", "ts"], keep="first")

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)

    for strict in (True, False):
        ours = (
            temporal.asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="ts",
                value_cols=["v"], strict=strict,
            )
            .toPandas()
            .set_index("id")["asof_v"]
            .sort_index()
        )
        ref = (
            pd.merge_asof(
                left_pd.sort_values("ts", kind="mergesort"),
                right_pd.sort_values("ts", kind="mergesort"),
                on="ts",
                by="k",
                allow_exact_matches=not strict,
            )
            .set_index("id")["v"]
            .sort_index()
        )
        pd.testing.assert_series_equal(
            ours, ref, check_names=False, check_exact=True
        )


def test_asof_join_matched_null_value_stays_null(spark):
    """Regression: a matched right row whose value is NULL must yield
    NULL, not resurrect an older non-null value (DuckDB/pandas semantics)."""
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T13:00:00"))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), 100.0),
            (1, _ts("2024-01-01T12:00:00"), None),
        ],
        "k long, ts timestamp, v double",
    )
    out = temporal.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        value_cols=["v"], strict=True,
    ).collect()
    assert out[0]["asof_v"] is None


def test_asof_directions_golden(spark):
    """Hand case covering all three directions and strictness at a tie:
    left rows at ts 10 and 20; right rows at ts 10 (v=1), 14 (v=2),
    30 (v=3)."""
    from march_mania_spark_lakehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [(10, 1.0), (14, 2.0), (30, 3.0)], "ts long, v double"
    ).withColumn("ts", F.timestamp_seconds("ts")).withColumn("k", F.lit(1))
    left = left.withColumn("k", F.lit(1))

    def run(direction, strict):
        out = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                        strict=strict, direction=direction)
        return {r["id"]: r["asof_v"] for r in out.collect()}

    assert run("backward", True) == {1: None, 2: 2.0}   # ts=10 tie excluded
    assert run("backward", False) == {1: 1.0, 2: 2.0}   # tie included
    assert run("forward", True) == {1: 2.0, 2: 3.0}     # first strictly later
    assert run("forward", False) == {1: 1.0, 2: 3.0}    # tie included
    # nearest strict: id1 → 14 (dist 4; the tie at 10 excluded);
    # id2 → 14 (dist 6) beats 30 (dist 10)
    assert run("nearest", True) == {1: 2.0, 2: 2.0}
    # nearest non-strict: id1 → exact match at 10
    assert run("nearest", False) == {1: 1.0, 2: 2.0}


def test_asof_nearest_on_long_ts(spark):
    """nearest must accept the same ts types as backward/forward — here
    plain integer timestamps, no timestamp cast anywhere (regression:
    the distance was once computed via unix_micros unconditionally)."""
    from march_mania_spark_lakehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100), (2, 205)], "id long, ts long"
    ).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [(90, 1.0), (104, 2.0), (300, 3.0)], "ts long, v double"
    ).withColumn("k", F.lit(1))
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                    strict=True, direction="nearest")
    got = {r["id"]: r["asof_v"] for r in out.collect()}
    assert got == {1: 2.0, 2: 3.0}  # 104 (d=4) beats 90; 300 (d=95) beats 104


def test_asof_nearest_tie_goes_backward(spark):
    """Equal distances pick the backward row (the pandas rule)."""
    from march_mania_spark_lakehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 20)], "id long, ts long").withColumn(
        "ts", F.timestamp_seconds("ts")).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [(15, 1.0), (25, 2.0)], "ts long, v double"
    ).withColumn("ts", F.timestamp_seconds("ts")).withColumn("k", F.lit(1))
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                    strict=True, direction="nearest")
    assert out.collect()[0]["asof_v"] == 1.0
