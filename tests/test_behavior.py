"""Property tests for the behavioral-analytics batch (queries_ext6):
funnel monotonicity, cohort mass conservation, sweep-line concurrency vs
brute force, weighted-sample determinism, fuzzy blocking
precision/completeness, and IVM split-invariance."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import behavior, fuzzy, ivm


def test_funnel_counts_monotone_nonincreasing(spark, sf_dir):
    ev = catalog.load(spark, "events", sf_dir)
    out = (
        behavior.funnel(ev, ("view", "click", "purchase"))
        .orderBy("stage_idx")
        .collect()
    )
    counts = [r.n_users for r in out]
    assert counts == sorted(counts, reverse=True)
    n_users = ev.select("user_id").distinct().count()
    assert counts[0] <= n_users


def test_cohort_offset_zero_covers_every_user(spark, sf_dir):
    """Every user is active in their own cohort period, so the offset-0
    diagonal sums to the total distinct-user count."""
    ev = catalog.load(spark, "events", sf_dir)
    tri = behavior.cohort_retention(ev).cache()
    diag = (
        tri.filter(F.col("period_offset") == 0)
        .agg(F.sum("n_users"))
        .collect()[0][0]
    )
    assert diag == ev.select("user_id").distinct().count()
    assert tri.filter(F.col("period_offset") < 0).count() == 0


def test_peak_concurrency_matches_bruteforce(spark, sf_dir):
    """Sweep-line result == brute force evaluated at session starts
    (the maximum of a step function is attained at a +1 point)."""
    ev = catalog.load(spark, "events", sf_dir)
    got = {
        r.day: r.peak_concurrent
        for r in behavior.peak_concurrency(ev, duration_minutes=30).collect()
    }
    pdf = ev.select("ts").toPandas()
    pdf["day"] = pdf.ts.dt.floor("D")
    dur = pd.Timedelta(minutes=30)
    for day, grp in pdf.groupby("day"):
        ts = grp.ts.sort_values().to_numpy()
        peak = max(
            ((ts <= t) & (t < ts + dur)).sum() for t in ts
        )
        assert got[day] == peak, f"day {day}: {got[day]} != {peak}"


def test_weighted_sample_is_partitioning_invariant(spark, sf_dir):
    """Same top-k under a different partitioning of the input — the
    sample is a pure function of (id, weight)."""
    from march_mania_spark_lakehouse_spark.plans.queries_ext6 import q110

    a = q110(spark, sf_dir).collect()
    docs = catalog.load(spark, "documents", sf_dir).repartition(13)
    from march_mania_spark_lakehouse_spark.operators.sampling import (
        HASH_ADD,
        HASH_MOD,
        HASH_MULT,
    )

    v = (F.col("doc_id") * F.lit(HASH_MULT) + F.lit(HASH_ADD)) % F.lit(HASH_MOD)
    pri = (v + 1).cast("double") / F.col("n_chars").cast("double")
    b = (
        docs.select("doc_id", "n_chars", pri.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(64)
        .collect()
    )
    assert [r.doc_id for r in a] == [r.doc_id for r in b]


def test_fuzzy_blocking_precision_and_completeness(spark, sf_dir):
    """(a) precision: every reported pair truly has edit distance ≤ 1;
    (b) completeness within blocks: brute force over same-block pairs.
    Cross-block distance-1 pairs are out of contract — the documented
    recall tradeoff of single-key blocking.

    For equal-length strings, levenshtein ≤ 1 ⟺ hamming ≤ 1 (one edit
    keeping length must be a substitution), so the brute force can use
    the cheap hamming distance — all c_name values share one length."""
    cust = catalog.load(spark, "customer", sf_dir)
    pairs = fuzzy.blocked_levenshtein_pairs(
        cust, "c_custkey", "c_name",
        block=F.substring(F.col("c_name"), 1, 16), max_dist=1,
    ).collect()

    def lev(a: str, b: str) -> int:
        assert len(a) == len(b)
        return sum(x != y for x, y in zip(a, b))

    names = {r.c_custkey: r.c_name for r in cust.collect()}
    # precision: every reported pair is within distance 1
    for r in pairs:
        assert lev(r.name_a, r.name_b) <= 1, (r.name_a, r.name_b)
    # completeness within blocks: brute force over same-block pairs
    got = {(r.id_a, r.id_b) for r in pairs}
    ids = sorted(names)
    want = {
        (i, j)
        for ai, i in enumerate(ids)
        for j in ids[ai + 1:]
        if names[i][:16] == names[j][:16] and lev(names[i], names[j]) <= 1
    }
    assert got == want


def test_ivm_merge_is_split_invariant(spark, sf_dir):
    """base⊕delta == 3-way split merge == full recompute (associativity
    + decimal exactness)."""
    orders = catalog.load(spark, "orders", sf_dir)
    c1 = F.lit("1997-01-01").cast("timestamp")
    c2 = F.lit("1999-01-01").cast("timestamp")
    three = ivm.finalize_state(
        ivm.merge_states(
            ivm.agg_state(orders.filter(F.col("o_orderdate") < c1), ["o_custkey"], "o_totalprice"),
            ivm.agg_state(
                orders.filter((F.col("o_orderdate") >= c1) & (F.col("o_orderdate") < c2)),
                ["o_custkey"], "o_totalprice",
            ),
            ivm.agg_state(orders.filter(F.col("o_orderdate") >= c2), ["o_custkey"], "o_totalprice"),
        )
    )
    full = ivm.finalize_state(ivm.agg_state(orders, ["o_custkey"], "o_totalprice"))
    a = {r.o_custkey: (r.n_rows, r.sum_m, r.avg_m, r.min_m, r.max_m) for r in three.collect()}
    b = {r.o_custkey: (r.n_rows, r.sum_m, r.avg_m, r.min_m, r.max_m) for r in full.collect()}
    assert a == b  # bit-identical, not approximately equal
