"""Targeted invariants for the fifth relational batch (q71–q80).

Oracle hash-parity is covered by `tools/driver_sim.py`; these tests pin
the semantic properties that the hash alone wouldn't explain if broken.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.plans import all_queries

Q = all_queries()


def run(name, spark, sf_dir):
    return Q[name].fn(spark, sf_dir)


def test_stat_moments_match_builtin(spark, sf_dir):
    """Decimal-derived variance/corr agree with Spark's float built-ins
    to well beyond the rounding the oracle contract applies."""
    got = {
        r["l_returnflag"]: r
        for r in run("q71_stat_moments", spark, sf_dir).collect()
    }
    ref = {
        r["l_returnflag"]: r
        for r in catalog.load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.var_samp("l_quantity").alias("v"),
            F.corr("l_quantity", "l_extendedprice").alias("c"),
        )
        .collect()
    }
    for flag, row in got.items():
        # q71 rounds to 6 decimals (oracle ulp policy) → compare at 5e-7 abs
        assert row["var_qty"] == pytest.approx(ref[flag]["v"], abs=5e-7)
        assert row["corr_qty_price"] == pytest.approx(ref[flag]["c"], abs=1e-8)


def test_unpivot_row_count_and_roundtrip(spark, sf_dir):
    """Melt produces exactly |rows| × |metrics| rows; values survive."""
    part = catalog.load(spark, "part", sf_dir)
    out = run("q72_unpivot_melt", spark, sf_dir)
    assert out.count() == 2 * part.count()
    back = (
        out.groupBy("p_partkey")
        .pivot("metric")
        .agg(F.first("value"))
        .withColumnRenamed("p_retailprice", "back_price")
    )
    orig = part.select("p_partkey", "p_retailprice")
    joined = back.join(orig, "p_partkey")
    assert joined.filter(F.col("back_price") != F.col("p_retailprice")).count() == 0


def test_full_outer_covers_both_sides(spark, sf_dir):
    """Every nation key present on either filtered side appears once."""
    out = run("q73_full_outer_join", spark, sf_dir)
    assert out.count() == out.select("nationkey").distinct().count()
    assert out.filter((F.col("n_cust") == 0) & (F.col("n_supp") == 0)).count() == 0


def test_exists_decorrelates_to_semi_anti(spark, sf_dir):
    """Catalyst must rewrite EXISTS/NOT EXISTS to semi/anti joins — the
    scale contract (no per-row subquery execution)."""
    plan = (
        run("q74_exists_subqueries", spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    )
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_mode_unique_and_argmax(spark, sf_dir):
    out = run("q76_mode_deterministic", spark, sf_dir).collect()
    statuses = {r["o_orderstatus"] for r in out}
    assert len(out) == len(statuses)
    cnt = (
        catalog.load(spark, "orders", sf_dir)
        .groupBy("o_orderstatus", "o_orderpriority")
        .count()
    )
    max_per = {
        r["o_orderstatus"]: r["m"]
        for r in cnt.groupBy("o_orderstatus").agg(F.max("count").alias("m")).collect()
    }
    for r in out:
        assert r["mode_count"] == max_per[r["o_orderstatus"]]


def test_grid_is_dense(spark, sf_dir):
    """Zero-fill grid = |regions| × |statuses| rows, no nulls."""
    out = run("q77_grid_zero_fill", spark, sf_dir)
    n_regions = catalog.load(spark, "region", sf_dir).count()
    n_status = (
        catalog.load(spark, "orders", sf_dir)
        .select("o_orderstatus")
        .distinct()
        .count()
    )
    assert out.count() == n_regions * n_status
    assert out.filter(F.col("n_orders").isNull()).count() == 0


def test_upsample_multiplicity(spark, sf_dir):
    """Each doc appears exactly weight(lang) times, copies numbered 1..w."""
    docs = catalog.load(spark, "documents", sf_dir)
    weights = {"en": 1, "zh": 3}
    out = run("q78_mixture_upsample", spark, sf_dir)
    per_doc = out.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n"), F.max("copy_idx").alias("mx")
    )
    bad = per_doc.filter(
        (F.col("n") != F.col("mx"))
        | (
            F.col("n")
            != F.when(F.col("lang") == "en", 1)
            .when(F.col("lang") == "zh", 3)
            .otherwise(2)
        )
    )
    assert bad.count() == 0
    expected = docs.select(
        F.sum(
            F.when(F.col("lang") == "en", 1)
            .when(F.col("lang") == "zh", 3)
            .otherwise(2)
        ).alias("s")
    ).collect()[0]["s"]
    assert out.count() == expected


def test_stratified_sample_is_subset_and_stable(spark, sf_dir):
    """Sample ⊆ population; zh stratum keeps 100%; re-running under a
    different partitioning yields the identical id set."""
    docs = catalog.load(spark, "documents", sf_dir)
    out = run("q79_stratified_hash_sample", spark, sf_dir)
    zh_all = docs.filter(F.col("lang") == "zh").count()
    assert out.filter(F.col("lang") == "zh").count() == zh_all
    ids1 = {r["doc_id"] for r in out.collect()}
    repart = docs.repartition(7, "source")
    from march_mania_spark_lakehouse_spark.operators.sampling import hash_bucket

    rate = (
        F.when(F.col("lang") == "zh", 100)
        .when(F.col("lang") == "en", 50)
        .otherwise(25)
    )
    ids2 = {
        r["doc_id"]
        for r in repart.filter(hash_bucket("doc_id") < rate)
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2


def test_gapfill_dense_and_locf(spark, sf_dir):
    """Spine is dense (n_users × n_days); after a user's first observed
    day the filled value is never null; filled equals the most recent
    observed daily max."""
    out = run("q80_gapfill_locf", spark, sf_dir).cache()
    n_users = out.select("user_id").distinct().count()
    n_days = out.select("day").distinct().count()
    assert out.count() == n_users * n_days

    ev = catalog.load(spark, "events", sf_dir).filter(F.col("user_id") < 50)
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    late_nulls = (
        out.join(first_day, "user_id")
        .filter((F.col("day") >= F.col("first_day")) & F.col("filled").isNull())
        .count()
    )
    assert late_nulls == 0
    out.unpersist()
